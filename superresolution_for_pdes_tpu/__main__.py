"""Subcommand dispatcher: ``python -m superresolution_for_pdes_tpu <cmd> ...``."""

from __future__ import annotations

import sys

COMMANDS = {
    "generate_data": "superresolution_for_pdes_tpu.cli.generate_data",
    "train": "superresolution_for_pdes_tpu.cli.train",
    "compare_methods": "superresolution_for_pdes_tpu.cli.compare_methods",
    "out_of_sample": "superresolution_for_pdes_tpu.cli.out_of_sample",
    "compare_test_cases": "superresolution_for_pdes_tpu.cli.compare_test_cases",
    "resolution_comparison": "superresolution_for_pdes_tpu.cli.resolution_comparison",
    "statistical": "superresolution_for_pdes_tpu.cli.statistical",
    "diagnose": "superresolution_for_pdes_tpu.cli.diagnose",
    "upscale": "superresolution_for_pdes_tpu.cli.upscale",
}


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help") or sys.argv[1] not in COMMANDS:
        print("usage: python -m superresolution_for_pdes_tpu <command> [args]")
        print("commands: " + ", ".join(COMMANDS))
        raise SystemExit(0 if len(sys.argv) >= 2 and sys.argv[1] in ("-h", "--help") else 2)
    import importlib

    module = importlib.import_module(COMMANDS[sys.argv[1]])
    module.main(sys.argv[2:])


if __name__ == "__main__":
    main()
