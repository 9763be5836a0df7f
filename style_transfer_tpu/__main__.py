"""``python -m style_transfer_tpu`` entry point."""

import sys

from style_transfer_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
