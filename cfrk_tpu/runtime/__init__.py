"""Runtime subsystems: metrics, checkpoint/resume, workflow orchestration.

These are the auxiliary subsystems SURVEY.md §5 records as absent from
the reference but required by BASELINE.json (per-stage metrics,
checkpointed streaming, multi-file orchestration replacing Swift/K).
"""

from .checkpoint import StreamCheckpoint, checkpoint_path
from .faults import InjectedFault
from .metrics import RunMetrics, StageTimer
from .workflow import (
    WorkflowResult,
    WorkflowTask,
    query_provenance,
    run_workflow,
)

__all__ = [
    "InjectedFault",
    "RunMetrics",
    "StageTimer",
    "StreamCheckpoint",
    "WorkflowResult",
    "WorkflowTask",
    "checkpoint_path",
    "query_provenance",
    "run_workflow",
]
