"""Speed-of-light models for every measured device route (one source of
truth — bench.py and tools/bench_suite.py import these, so the recorded
``vs_sol`` fractions can never drift between the two artifacts).

The reference publishes no numbers (BASELINE.md), so every benchmark in
this repo reports an achieved fraction of an explicit per-implementation
roofline instead.  Chip constants are TPU v5e (one chip):

* int8 MXU peak 394 Top/s, bf16 197 Tflop/s;
* HBM ~819 GB/s;
* VPU ALU ~6e12 element-ops/s (clock pinned by the MXU peak, (8,128)
  lanes x 4 ALUs), cross-lane permute path ~1.5e12/s, and an EMPIRICAL
  ~1e12/s one-hot materialisation rate (round 2's step-time
  decomposition: ~1.3 G int8 one-hot elements in ~1.4 ms — packing
  relayouts, not raw ALU, bind it).

Roofline families:

* :func:`dense_emit_sol` — the write-bound bar of a DENSE per-read
  emitter: max(MXU time of the one-hot contractions, one HBM write of
  the b4-packed count matrix).  This is the "market price" of the dense
  per-read op — what an ideal dense-matrix producer could reach — and
  the bar bench.py scores the pairs route against.
* :func:`onehot_family_sol` — the same op, charged honestly for the
  compare-built one-hot IMPLEMENTATION family: adds the VPU build of
  2*W*(4**kh + 4**kl) one-hot elements per read, which round 2 measured
  as the ~2 ms/batch design floor of this family on this chip.  A
  one-hot kernel's vs_sol approaches 1.0 under this model; the gap
  between this and :func:`dense_emit_sol` is the floor proof.
* :func:`sort_sol` — the fused sort+RLE kernel's own bound: the bitonic
  network's log2(n)*(log2(n)+1)/2 compare-exchange passes, charged per
  element per key as one cross-lane partner fetch (permute path) plus
  two ALU ops (compare, select), PLUS the RLE's neighbour-compare and
  log2(n) suffix-min passes at the same rate, PLUS the pair-emit/key
  HBM traffic (overlappable → max, not sum).  Re-derived round 4: the
  round-3 model charged only the sort network (VERDICT r3).
* :func:`scatter_sol` — XLA's serialised scatter accumulate, charged at
  one update per VPU cycle (~0.94e9/s).  Generous to XLA (real scatters
  also re-walk the table), but it makes the sort route's win quotable.
"""

from __future__ import annotations

from .encode import split_k

__all__ = [
    "INT8_MXU_OPS",
    "BF16_MXU_FLOPS",
    "HBM_BW",
    "VPU_ALU_OPS",
    "CROSS_LANE_OPS",
    "ONEHOT_BUILD_ELEMS_PER_S",
    "SCALAR_UPDATES_PER_S",
    "pad_pow2",
    "dense_emit_sol",
    "onehot_family_sol",
    "sort_sol",
    "scatter_sol",
]

INT8_MXU_OPS = 394e12
BF16_MXU_FLOPS = 197e12
HBM_BW = 819e9
# Raw VPU ALU throughput: the bf16 MXU peak (197e12 = 2*128*128*4 MXUs
# * ~1.5 GHz) pins the clock; the VPU is (8, 128) lanes x 4 ALUs at the
# same clock = ~6e12 element-ops/s.
VPU_ALU_OPS = 6.0e12
# Cross-lane traffic (rolls, gathers/permutes) moves ~1 vreg/cycle
# through the permute path: 1024 lanes * 1.5 GHz = ~1.5e12 elements/s.
CROSS_LANE_OPS = 1.5e12
# EMPIRICAL effective rate of materialising int8 one-hot elements
# (compare + cast + packed store): round 2's step-time decomposition
# measured ~1.3 G elements in ~1.4 ms (docs/PERF.md) — the packing
# relayouts keep it far below the raw ALU peak.  This constant anchors
# the one-hot family floor the way it was actually measured.
ONEHOT_BUILD_ELEMS_PER_S = 1.0e12
SCALAR_UPDATES_PER_S = 0.94e9


def pad_pow2(w: int, floor: int = 128) -> int:
    n = floor
    while n < w:
        n *= 2
    return n


def dense_emit_sol(batch: int, read_len: int, k: int,
                   *, bytes_per_bin: float = 1.0) -> float:
    """bases/s bar of an ideal dense per-read emitter (no build charge)."""
    w = read_len - k + 1
    four_k = 4**k
    flops = 2.0 * batch * w * four_k
    io = batch * four_k * bytes_per_bin
    t = max(flops / INT8_MXU_OPS, io / HBM_BW)
    return batch * read_len / t


def onehot_family_sol(batch: int, read_len: int, k: int,
                      *, per_read: bool = True,
                      bytes_per_bin: float = 1.0) -> float:
    """bases/s bound of any compare-built one-hot kernel on this chip.

    ``per_read=False`` models the global-spectrum kernel: the table is
    written once (negligible) instead of per read, but the one-hot VPU
    build — the binding term at k <= 10 — is identical.
    """
    w = read_len - k + 1
    kh, kl = split_k(k)
    fh, fl = 4**kh, 4**kl
    four_k = 4**k
    flops = 2.0 * batch * w * four_k
    build_elems = 2.0 * batch * w * (fh + fl)
    io = batch * four_k * bytes_per_bin if per_read else four_k * 4.0
    t = max(
        flops / INT8_MXU_OPS,
        io / HBM_BW,
        build_elems / ONEHOT_BUILD_ELEMS_PER_S,
    )
    return batch * read_len / t


def sort_sol(batch: int, read_len: int, k: int, *, keys: int = 1) -> float:
    """bases/s bound of the fused per-read bitonic sort + RLE kernel.

    Re-derived round 4 (the round-3 model charged only the sort network
    — VERDICT r3 asked for RLE/emit to be priced in).  Charges, per
    element:

    * **sort network** — log2(n)(log2(n)+1)/2 compare-exchange stages,
      each needing per key ONE cross-lane partner fetch (permute path,
      CROSS_LANE_OPS) and two ALU ops (compare + select, VPU_ALU_OPS);
      the stages are sequentially dependent, so the terms add.  The
      FULL n-element network is charged even where an implementation
      can prune all-sentinel pad work (e.g. the g=2 half-skip layout,
      ops/pallas/rowsort.py — pruning climbs toward this bound, it does
      not move it).
    * **RLE** — the neighbour compare (one pass per key) plus the
      log2(n) masked-shift suffix-min passes, at the same
      permute + 2-ALU cost per pass (every pass is a shifted fetch,
      a compare/min, and a select).
    * **pair emit / key read** — (2*keys + 1) int32 HBM transfers per
      element (keys in, masked keys + counts out), overlappable with
      compute in an ideal pipelined kernel, hence max(), not a sum.
    """
    w = read_len - k + 1
    # floor 32 matches the kernel's short-read span packing (128/span
    # reads per row): the network size is the padded span, not 128.
    n = pad_pow2(w, floor=32)
    log_n = n.bit_length() - 1
    stages = log_n * (log_n + 1) // 2
    per_pass_s = 1.0 / CROSS_LANE_OPS + 2.0 / VPU_ALU_OPS
    rle_passes = log_n + keys
    compute = batch * n * (stages * keys + rle_passes) * per_pass_s
    io = batch * n * 4.0 * (2 * keys + 1) / HBM_BW
    t = max(compute, io)
    return batch * read_len / t


def scatter_sol(batch: int, read_len: int, k: int) -> float:
    """bases/s bound of an XLA scatter-accumulate dense table update."""
    w = read_len - k + 1
    t = batch * w / SCALAR_UPDATES_PER_S
    return batch * read_len / t
