"""``python -m humid_tpu`` — the drop-in CLI (docs/cli.md)."""

import sys

from .cli import main

sys.exit(main())
