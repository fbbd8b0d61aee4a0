"""``python -m cfrk_tpu`` — see cfrk_tpu.cli."""

import sys

from .cli import main

sys.exit(main())
