"""``python -m multimodal_mtrssm_tpu <command>`` — the console entry points
(reference poe tasks, ``pyproject.toml:100-104``) without needing an
installed distribution.

Commands: train-mopoe-mrssm, train-mopoe-mmtrssm, evaluate-word-transitions,
serve. Remaining argv is passed through to the underlying script.
"""

from __future__ import annotations

import sys

from multimodal_mtrssm_tpu import cli

_COMMANDS = {
    "train-mopoe-mrssm": cli.train_mopoe_mrssm,
    "train-mopoe-mmtrssm": cli.train_mopoe_mmtrssm,
    "evaluate-word-transitions": cli.evaluate_word_transitions,
}


def main() -> None:
    """Dispatch `python -m multimodal_mtrssm_tpu <command>` to the CLI entry points."""
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        names = ", ".join([*_COMMANDS, "serve"])
        print(f"usage: python -m multimodal_mtrssm_tpu <command> [args]\ncommands: {names}")
        raise SystemExit(0 if len(sys.argv) >= 2 else 2)
    command, sys.argv = sys.argv[1], [sys.argv[0], *sys.argv[2:]]
    if command == "serve":
        # In-package entry (works from an installed distribution too).
        from multimodal_mtrssm_tpu.server import main as serve_main

        serve_main(sys.argv[1:])
        return
    fn = _COMMANDS.get(command)
    if fn is None:
        print(f"unknown command {command!r}; have: {', '.join([*_COMMANDS, 'serve'])}")
        raise SystemExit(2)
    fn()


if __name__ == "__main__":
    main()
