"""``python -m ppsim_tpu`` — CLI entry point (reference: part1/main.cpp)."""

import sys

from ppsim_tpu.harness import main

if __name__ == "__main__":
    sys.exit(main())
