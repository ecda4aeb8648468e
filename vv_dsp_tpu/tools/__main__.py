"""Dispatcher: ``python -m vv_dsp_tpu.tools <tool> [args...]``."""

import importlib
import sys

from vv_dsp_tpu.tools import TOOLS


def main() -> int:
    if len(sys.argv) < 2 or sys.argv[1] not in TOOLS:
        sys.stderr.write("usage: python -m vv_dsp_tpu.tools <tool> [args...]\n"
                         "tools: " + " ".join(TOOLS) + "\n")
        return 2
    mod = importlib.import_module(f"vv_dsp_tpu.tools.{sys.argv[1]}")
    return mod.main(sys.argv[2:])


if __name__ == "__main__":
    raise SystemExit(main())
