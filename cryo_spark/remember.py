"""`--remember` arg persistence.

Mirrors /root/reference/crates/cli/src/remember.rs: `--remember`
saves the current command as the default for the output directory
(one per directory, stored as JSON under the run-metadata dir); a
later invocation without datatypes replays it, with any newly-passed
arguments taking precedence (run.rs:38-51 merge_with_precedence).
"""

from __future__ import annotations

import json
import os

REMEMBER_FILENAME = "remembered_command.json"


def _cryo_dir(output_dir: str) -> str:
    return os.path.join(output_dir, ".cryo_spark")


def remembered_command_path(output_dir: str) -> str:
    return os.path.join(_cryo_dir(output_dir), REMEMBER_FILENAME)


def save_remembered_command(output_dir: str, command: list[str]) -> str:
    from cryo_spark import __version__

    os.makedirs(_cryo_dir(output_dir), exist_ok=True)
    path = remembered_command_path(output_dir)
    with open(path, "w") as f:
        json.dump({"cryo_spark_version": __version__, "command": command}, f)
    return path


def load_remembered_command(output_dir: str) -> dict:
    from cryo_spark import __version__

    path = remembered_command_path(output_dir)
    if not os.path.exists(path):
        raise SystemExit(
            "either 1) specify datasets to collect or "
            "2) specify a command to remember with --remember"
        )
    with open(path) as f:
        remembered = json.load(f)
    if remembered.get("cryo_spark_version") != __version__:
        import sys

        print(
            "remembered command comes from a different version, "
            "proceed with caution",
            file=sys.stderr,
        )
    return remembered
