"""``python -m nextsimdg_tpu`` — the model executable."""

import sys

from .runtime.main import main

sys.exit(main())
