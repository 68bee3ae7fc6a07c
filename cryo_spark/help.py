"""CLI help subcommands.

Mirrors the reference's `cryo help` routing
(crates/cli/src/run.rs:76-174): `help` prints the general usage,
`help syntax` the block/tx specification syntax, `help datasets` the
registry with aliases and multi-datatype groups, and
`help <DATASET...>` per-dataset detail (collect dimensions, required/
optional parameters, aliases, schema) — rendered from the same
`schemas.DatasetSpec` registry the planner uses, so the help text can
never drift from actual behavior. Plain text, no color deps.
"""

from __future__ import annotations

from cryo_spark import schemas

SYNTAX_HELP = """\
Block specification syntax
--------------------------
- can use numbers                    --blocks 5000 6000 7000
- can use ranges                     --blocks 12M:13M 15M:16M
- numbers can contain { _ . K M B }  5_000 5K 15M 15.5M
- omitting range end means latest    15.5M: == 15.5M:latest
- omitting range start means 0       :700 == 0:700
- minus on start means minus end     -1000:7000 == 6000:7000
- plus sign on end means plus start  15M:+1000 == 15M:15.001M
- can use every nth value            2000:5000:1000 == 2000 3000 4000
- can use n values total             100:200/5 == 100 124 149 174 199

Transaction specification syntax
--------------------------------
- can use transaction hashes         --txs TX_HASH1 TX_HASH2 TX_HASH3

Timestamp specification (--timestamps) accepts the same range syntax
with time-unit suffixes and resolves to blocks via binary search.
"""


def _header(title: str) -> str:
    return f"{title}\n{'─' * len(title)}"


def print_syntax_help() -> None:
    print(SYNTAX_HELP)


def print_all_datasets() -> None:
    from cryo_spark.api import MULTI_DATATYPES

    print(_header("cryo_spark datasets"))
    for name in sorted(schemas.DATASETS):
        aliases = schemas.DATASETS[name].aliases
        if len(aliases) > 1:
            print(f"- {name} (aliases = {', '.join(aliases)})")
        elif aliases:
            print(f"- {name} (alias = {aliases[0]})")
        else:
            print(f"- {name}")
    print()
    print(_header("dataset group names"))
    for group, members in MULTI_DATATYPES.items():
        print(f"- {group}: {', '.join(members)}")
    print()
    print("use `cryo_spark help <DATASET>` to print info about a "
          "specific dataset")


def print_dataset_info(name: str) -> None:
    """Per-dataset help (reference print_dataset_info,
    crates/freeze/src/types/summaries.rs:65-110)."""
    spec = schemas.get_spec(name)
    print(_header(spec.name))
    # collect dimensions: every dataset collects by block; by-tx needs
    # a transaction_hash column (api._tx_dimension_check)
    if "transaction_hash" in spec.column_names():
        print("- can collect by block or by transaction")
    else:
        print("- can collect by block and not by transaction")
    req = ", ".join(spec.required_dims) or "[none]"
    opt = ", ".join(spec.optional_dims) or "[none]"
    ali = ", ".join(spec.aliases) or "[none]"
    print(f"- required parameters: {req}")
    print(f"- optional parameters: {opt}")
    print(f"- dataset aliases: {ali}")
    if spec.arg_aliases:
        print("- parameter aliases:")
        for k, v in spec.arg_aliases.items():
            print(f"    - {k} -> {v}")
    else:
        print("- parameter aliases: [none]")
    print()
    defaults = set(spec.default_columns())
    print(_header(f"{spec.name} schema"))
    for col in spec.columns:
        mark = "" if col.name in defaults else "   (non-default)"
        print(f"- {col.name}: {col.ctype}{mark}")
    if spec.sort:
        print(f"\nsorted by: {', '.join(spec.sort)}")


def handle_help(args: list[str]) -> int:
    """Route `cryo_spark help [...]` (run.rs:76-90). Returns the
    process exit code."""
    if not args:
        return 1  # caller prints general help
    if args == ["syntax"]:
        print_syntax_help()
        return 0
    if args == ["datasets"]:
        print_all_datasets()
        return 0
    from cryo_spark.api import expand_datatypes

    try:
        names = expand_datatypes(args)
    except schemas.UnknownDatasetError as exc:
        import difflib
        import sys

        # a typo'd SUBCOMMAND ('help sintax') otherwise reads as an
        # unknown dataset — suggest the help topics alongside any
        # dataset close-matches
        topics = difflib.get_close_matches(
            args[0].lower(), ["syntax", "datasets"], n=1, cutoff=0.6
        )
        msg = str(exc)
        if topics and not exc.suggestions:
            msg += f" (did you mean: help {topics[0]}?)"
        # stderr, matching main()'s unknown-dataset convention —
        # scripts parsing help output must not see the error on stdout
        print(f"error: {msg}", file=sys.stderr)
        return 2
    for i, name in enumerate(names):
        if i:
            print("\n")
        print_dataset_info(name)
    return 0
