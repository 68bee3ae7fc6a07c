"""Dataset schema registry.

Mirrors the reference's schema system (Table/ColumnType —
/root/reference/crates/freeze/src/types/schemas.rs:25-135, dataset
structs under crates/freeze/src/datasets/) as a data-driven registry:
each dataset declares an ordered column list, per-column logical
types, default column subset, sort columns, aliases and required
dims. Spark mapping of the reference ColumnType enum:

  Boolean→boolean, UInt32→int (convention: non-negative), UInt64→long,
  UInt256→canonical 32-byte big-endian binary word, expanded on
  output into derived representation columns (suffixes
  _binary/_string/_f64/... — schemas.rs:63-106, schema_select
  u256_view_cols), String→string, Binary→binary, Hex→string.

All output tables are flat (the reference rejects nested event params
— crates/to_df/src/lib.rs:137-141); every table carries chain_id
(crates/to_df/src/lib.rs:237-241).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

# logical column types (reference ColumnType, schemas.rs:110-135)
BOOL = "bool"
UINT32 = "uint32"
UINT64 = "uint64"
U256 = "u256"
INT32 = "int32"
INT64 = "int64"
FLOAT32 = "float32"
FLOAT64 = "float64"
STRING = "string"
BINARY = "binary"
HEX = "hex"

SPARK_TYPES: dict[str, T.DataType] = {
    BOOL: T.BooleanType(),
    UINT32: T.IntegerType(),
    UINT64: T.LongType(),
    U256: T.BinaryType(),  # canonical carrier: 32-byte big-endian word
    INT32: T.IntegerType(),
    INT64: T.LongType(),
    FLOAT32: T.FloatType(),
    FLOAT64: T.DoubleType(),
    STRING: T.StringType(),
    BINARY: T.BinaryType(),
    HEX: T.StringType(),
}

# u256 representation suffixes (schemas.rs:63-106); default set mirrors
# crates/cli/src/parse/schemas.rs:87-109.
U256_SUFFIXES = ["_binary", "_string", "_f32", "_f64", "_u32", "_u64", "_d128"]
U256_DEFAULT_REPS = ["_binary", "_string", "_f64"]


@dataclass(frozen=True)
class Col:
    name: str
    ctype: str
    nullable: bool = True


@dataclass(frozen=True)
class DatasetSpec:
    name: str
    columns: tuple[Col, ...]
    defaults: tuple[str, ...] = ()  # empty → all columns are default
    sort: tuple[str, ...] = ("block_number",)
    aliases: tuple[str, ...] = ()
    required_dims: tuple[str, ...] = ()
    optional_dims: tuple[str, ...] = ()
    arg_aliases: dict[str, str] = field(default_factory=dict)
    # point-lookup datasets default to the chain tip when no blocks
    # are given (e.g. balances.rs:26-28); None -> full range
    default_blocks: str | None = None

    def column_names(self) -> list[str]:
        return [c.name for c in self.columns]

    def default_columns(self) -> list[str]:
        return list(self.defaults) if self.defaults else self.column_names()

    def spark_schema(self, names: list[str] | None = None) -> T.StructType:
        by_name = {c.name: c for c in self.columns}
        names = names if names is not None else self.column_names()
        return T.StructType(
            [T.StructField(n, SPARK_TYPES[by_name[n].ctype], by_name[n].nullable) for n in names]
        )


def _cols(*specs: tuple) -> tuple[Col, ...]:
    return tuple(Col(*s) for s in specs)


DATASETS: dict[str, DatasetSpec] = {}


def register(spec: DatasetSpec) -> DatasetSpec:
    DATASETS[spec.name] = spec
    return spec


class UnknownDatasetError(KeyError):
    """Raised for a datatype name that resolves to nothing. Subclasses
    KeyError (existing callers keep catching it) and carries close-name
    ``suggestions`` so surfaces (CLI) can answer a typo with candidates
    instead of a traceback."""

    def __init__(self, name: str, suggestions: list[str]):
        self.dataset = name
        self.suggestions = suggestions
        msg = f"unknown dataset: {name}"
        if suggestions:
            msg += " (did you mean: " + ", ".join(suggestions) + "?)"
        super().__init__(msg)

    def __str__(self) -> str:  # KeyError quotes its arg; keep it plain
        return self.args[0]


def known_names() -> list[str]:
    """Every resolvable datatype name: canonical + aliases."""
    out: list[str] = list(DATASETS)
    for spec in DATASETS.values():
        out.extend(spec.aliases)
    return out


def resolve_name(name: str) -> str:
    """Resolve a dataset name or alias (scalar.rs:46-73) to canonical."""
    n = name.lower()
    if n in DATASETS:
        return n
    for spec in DATASETS.values():
        if n in spec.aliases:
            return spec.name
    import difflib

    raise UnknownDatasetError(
        name, difflib.get_close_matches(n, known_names(), n=3, cutoff=0.6)
    )


def get_spec(name: str) -> DatasetSpec:
    return DATASETS[resolve_name(name)]


# --------------------------------------------------------------------------
# registry entries (column order = reference struct order, which is what
# cryo_test compares — polars_utils.py:119-129)
# --------------------------------------------------------------------------

register(DatasetSpec(
    name="blocks",
    columns=_cols(
        ("block_hash", BINARY), ("parent_hash", BINARY), ("uncles_hash", BINARY),
        ("author", BINARY), ("state_root", BINARY), ("transactions_root", BINARY),
        ("receipts_root", BINARY), ("block_number", UINT32, False),
        ("gas_used", UINT64), ("gas_limit", UINT64), ("extra_data", BINARY),
        ("logs_bloom", BINARY), ("timestamp", UINT32), ("difficulty", UINT64),
        ("total_difficulty", U256), ("size", UINT64), ("mix_hash", BINARY),
        ("nonce", BINARY), ("base_fee_per_gas", UINT64),
        ("withdrawals_root", BINARY), ("chain_id", UINT64),
    ),
    defaults=("block_number", "block_hash", "timestamp", "author", "gas_used",
              "extra_data", "base_fee_per_gas", "chain_id"),
    sort=("block_number",),
))

register(DatasetSpec(
    name="transactions",
    aliases=("txs",),
    columns=_cols(
        ("block_number", UINT32), ("transaction_index", UINT64),
        ("transaction_hash", BINARY, False), ("nonce", UINT64),
        ("from_address", BINARY), ("to_address", BINARY), ("value", U256),
        ("input", BINARY), ("gas_limit", UINT64), ("gas_used", UINT64),
        ("gas_price", UINT64), ("transaction_type", UINT32),
        ("max_priority_fee_per_gas", UINT64), ("max_fee_per_gas", UINT64),
        ("success", BOOL), ("n_input_bytes", UINT32),
        ("n_input_zero_bytes", UINT32), ("n_input_nonzero_bytes", UINT32),
        ("block_hash", BINARY), ("chain_id", UINT64), ("timestamp", UINT32),
        ("r", BINARY), ("s", BINARY), ("v", BOOL),
    ),
    defaults=("block_number", "transaction_index", "transaction_hash", "nonce",
              "from_address", "to_address", "value", "input", "gas_limit",
              "gas_used", "gas_price", "transaction_type",
              "max_priority_fee_per_gas", "max_fee_per_gas", "success",
              "n_input_bytes", "chain_id"),
    sort=("block_number", "transaction_index"),
))

register(DatasetSpec(
    name="logs",
    aliases=("events",),
    columns=_cols(
        ("block_number", UINT32), ("block_hash", BINARY),
        ("transaction_index", UINT32), ("log_index", UINT32),
        ("transaction_hash", BINARY), ("address", BINARY),
        ("topic0", BINARY), ("topic1", BINARY), ("topic2", BINARY),
        ("topic3", BINARY), ("data", BINARY), ("n_data_bytes", UINT32),
        ("chain_id", UINT64),
    ),
    defaults=("block_number", "transaction_index", "log_index",
              "transaction_hash", "address", "topic0", "topic1", "topic2",
              "topic3", "data", "n_data_bytes", "chain_id"),
    sort=("block_number", "log_index"),
    optional_dims=("address", "topic0", "topic1", "topic2", "topic3"),
    arg_aliases={"contract": "address"},
))

register(DatasetSpec(
    name="erc20_transfers",
    columns=_cols(
        ("block_number", UINT32), ("block_hash", BINARY),
        ("transaction_index", UINT32), ("log_index", UINT32),
        ("transaction_hash", BINARY), ("erc20", BINARY),
        ("from_address", BINARY), ("to_address", BINARY),
        ("value", U256), ("chain_id", UINT64),
    ),
    defaults=("block_number", "transaction_index", "log_index",
              "transaction_hash", "erc20", "from_address", "to_address",
              "value", "chain_id"),
    sort=("block_number", "log_index"),
    optional_dims=("address", "topic0", "topic1", "topic2",
                   "from_address", "to_address"),
    arg_aliases={"contract": "address"},
))

register(DatasetSpec(
    name="erc20_approvals",
    columns=_cols(
        ("block_number", UINT32), ("block_hash", BINARY),
        ("transaction_index", UINT32), ("log_index", UINT32),
        ("transaction_hash", BINARY), ("erc20", BINARY),
        ("from_address", BINARY), ("to_address", BINARY),
        ("value", U256), ("chain_id", UINT64),
    ),
    defaults=("block_number", "transaction_index", "log_index",
              "transaction_hash", "erc20", "from_address", "to_address",
              "value", "chain_id"),
    sort=("block_number", "log_index"),
))

register(DatasetSpec(
    name="erc721_transfers",
    columns=_cols(
        ("block_number", UINT32), ("block_hash", BINARY),
        ("transaction_index", UINT32), ("log_index", UINT32),
        ("transaction_hash", BINARY), ("erc721", BINARY),
        ("from_address", BINARY), ("to_address", BINARY),
        ("token_id", U256), ("chain_id", UINT64),
    ),
    defaults=("block_number", "transaction_index", "log_index",
              "transaction_hash", "erc721", "from_address", "to_address",
              "token_id", "chain_id"),
    sort=("block_number", "log_index"),
))

register(DatasetSpec(
    name="traces",
    columns=_cols(
        ("action_from", BINARY), ("action_to", BINARY),
        ("action_value", U256), ("action_gas", UINT32),
        ("action_input", BINARY), ("action_call_type", STRING),
        ("action_init", BINARY), ("action_reward_type", STRING),
        ("action_type", STRING), ("result_gas_used", UINT32),
        ("result_output", BINARY), ("result_code", BINARY),
        ("result_address", BINARY), ("trace_address", STRING),
        ("subtraces", UINT32), ("transaction_index", UINT32),
        ("transaction_hash", BINARY), ("block_number", UINT32),
        ("block_hash", BINARY), ("error", STRING), ("chain_id", UINT64),
    ),
    sort=("block_number", "transaction_index"),
))

register(DatasetSpec(
    name="contracts",
    columns=_cols(
        ("block_number", UINT32), ("block_hash", BINARY),
        ("create_index", UINT32), ("transaction_hash", BINARY),
        ("contract_address", BINARY), ("deployer", BINARY),
        ("factory", BINARY), ("init_code", BINARY), ("code", BINARY),
        ("init_code_hash", BINARY), ("n_init_code_bytes", UINT32),
        ("n_code_bytes", UINT32), ("code_hash", BINARY),
        ("chain_id", UINT64),
    ),
    sort=("block_number", "create_index"),
))

register(DatasetSpec(
    name="native_transfers",
    columns=_cols(
        ("block_number", UINT32), ("block_hash", BINARY),
        ("transaction_index", UINT32), ("transfer_index", UINT32),
        ("transaction_hash", BINARY), ("from_address", BINARY),
        ("to_address", BINARY), ("value", U256), ("chain_id", UINT64),
    ),
    sort=("block_number", "transfer_index"),
    optional_dims=("from_address", "to_address"),
))

for _kind, _vt in [("balance", U256), ("nonce", UINT64), ("code", BINARY),
                   ("storage", BINARY)]:
    _slot = (("slot", BINARY),) if _kind == "storage" else ()
    register(DatasetSpec(
        name=f"{_kind}_diffs",
        aliases=("slot_diffs",) if _kind == "storage" else (),
        columns=_cols(
            ("block_number", UINT32), ("transaction_index", UINT32),
            ("transaction_hash", BINARY), ("address", BINARY), *_slot,
            (f"from_value", _vt), (f"to_value", _vt), ("chain_id", UINT64),
        ),
        sort=("block_number", "transaction_index"),
    ))
    register(DatasetSpec(
        name=f"{_kind}_reads",
        aliases=("slot_reads",) if _kind == "storage" else (),
        columns=_cols(
            ("block_number", UINT32), ("transaction_index", UINT32),
            ("transaction_hash", BINARY), ("address", BINARY), *_slot,
            ("value", _vt), ("chain_id", UINT64),
        ),
        sort=("block_number", "transaction_index"),
    ))

register(DatasetSpec(
    name="balances",
    default_blocks="latest",
    columns=_cols(
        ("block_number", UINT32), ("address", BINARY),
        ("balance", U256), ("chain_id", UINT64),
    ),
    sort=("block_number", "address"),
    required_dims=("address",),
))

register(DatasetSpec(
    name="nonces",
    default_blocks="latest",
    columns=_cols(
        ("block_number", UINT32), ("address", BINARY),
        ("nonce", UINT64), ("chain_id", UINT64),
    ),
    sort=("block_number", "address"),
    required_dims=("address",),
))

register(DatasetSpec(
    name="codes",
    default_blocks="latest",
    columns=_cols(
        ("block_number", UINT32), ("address", BINARY),
        ("code", BINARY), ("n_code_bytes", UINT32), ("chain_id", UINT64),
    ),
    sort=("block_number", "address"),
    required_dims=("address",),
))

register(DatasetSpec(
    name="slots",
    default_blocks="latest",
    aliases=("storages",),
    columns=_cols(
        ("block_number", UINT32), ("address", BINARY), ("slot", BINARY),
        ("value", BINARY), ("chain_id", UINT64),
    ),
    sort=("block_number", "address", "slot"),
    required_dims=("address", "slot"),
    arg_aliases={"contract": "address"},
))

register(DatasetSpec(
    name="eth_calls",
    default_blocks="latest",
    columns=_cols(
        ("block_number", UINT32), ("contract_address", BINARY),
        ("call_data", BINARY), ("call_data_hash", BINARY),
        ("output_data", BINARY), ("output_data_hash", BINARY),
        ("chain_id", UINT64),
    ),
    sort=("block_number", "contract_address"),
    required_dims=("contract", "call_data"),
))

register(DatasetSpec(
    name="four_byte_counts",
    aliases=("4byte_counts",),
    columns=_cols(
        ("block_number", UINT32), ("transaction_hash", BINARY),
        ("signature", BINARY), ("size", UINT64), ("count", UINT64),
        ("chain_id", UINT64),
    ),
    sort=("block_number",),
))

register(DatasetSpec(
    name="address_appearances",
    columns=_cols(
        ("block_number", UINT32), ("transaction_index", UINT32),
        ("transaction_hash", BINARY), ("address", BINARY),
        ("relationship", STRING), ("chain_id", UINT64),
    ),
    sort=("block_number", "transaction_index", "address", "relationship"),
))

register(DatasetSpec(
    name="erc20_metadata",
    default_blocks="latest",
    columns=_cols(
        ("block_number", UINT32), ("erc20", BINARY), ("name", STRING),
        ("symbol", STRING), ("decimals", UINT32), ("chain_id", UINT64),
    ),
    sort=("block_number", "erc20"),
    required_dims=("address",),
))

register(DatasetSpec(
    name="erc20_supplies",
    default_blocks="latest",
    columns=_cols(
        ("block_number", UINT32), ("erc20", BINARY),
        ("total_supply", U256), ("chain_id", UINT64),
    ),
    sort=("block_number", "erc20"),
    required_dims=("address",),
))

register(DatasetSpec(
    name="erc721_metadata",
    default_blocks="latest",
    columns=_cols(
        ("block_number", UINT32), ("erc721", BINARY), ("name", STRING),
        ("symbol", STRING), ("chain_id", UINT64),
    ),
    sort=("symbol", "block_number"),
    required_dims=("address",),
    arg_aliases={"contract": "address"},
))

register(DatasetSpec(
    name="trace_calls",
    default_blocks="latest",
    columns=_cols(
        # reference struct order: datasets/trace_calls.rs:9-32
        ("block_number", UINT32), ("transaction_index", UINT32),
        ("action_from", BINARY), ("action_to", BINARY),
        ("action_value", STRING), ("action_gas", UINT32),
        ("action_input", BINARY), ("action_call_type", STRING),
        ("action_init", BINARY), ("action_reward_type", STRING),
        ("action_type", STRING, False), ("result_gas_used", UINT32),
        ("result_output", BINARY), ("result_code", BINARY),
        ("result_address", BINARY), ("trace_address", STRING),
        ("subtraces", UINT32), ("error", STRING),
        ("tx_to_address", BINARY, False), ("tx_call_data", BINARY, False),
        ("chain_id", UINT64),
    ),
    sort=("block_number", "tx_to_address"),
    required_dims=("contract", "call_data"),
    arg_aliases={"address": "contract", "to_address": "contract"},
))

register(DatasetSpec(
    name="geth_calls",
    columns=_cols(
        # datasets/geth_calls.rs:8-24
        ("typ", STRING, False), ("from_address", BINARY, False),
        ("to_address", BINARY), ("value", U256), ("gas", UINT64),
        ("gas_used", UINT64), ("input", BINARY, False),
        ("output", BINARY), ("error", STRING),
        ("block_number", UINT32), ("transaction_hash", BINARY),
        ("transaction_index", UINT32), ("trace_address", STRING),
        ("chain_id", UINT64),
    ),
    sort=("block_number", "transaction_index"),
))

for _kind, _vt in [("balance", U256), ("code", BINARY), ("nonce", UINT64),
                   ("storage", BINARY)]:
    _slot = (("slot", BINARY, False),) if _kind == "storage" else ()
    register(DatasetSpec(
        # datasets/geth_{balance,code,nonce,storage}_diffs.rs: same
        # per-account diff rows as the parity family, via the geth
        # prestate+diff tracer; transaction_index is u64 there
        name=f"geth_{_kind}_diffs",
        columns=_cols(
            ("block_number", UINT32), ("transaction_index", UINT64),
            ("transaction_hash", BINARY), ("address", BINARY, False), *_slot,
            ("from_value", _vt), ("to_value", _vt), ("chain_id", UINT64),
        ),
        sort=("block_number", "transaction_index"),
    ))

register(DatasetSpec(
    name="geth_opcodes",
    columns=_cols(
        # datasets/geth_opcodes.rs:10-28
        ("block_number", UINT32), ("transaction_hash", BINARY),
        ("transaction_index", UINT32), ("trace_address", STRING, False),
        ("depth", UINT64), ("error", STRING), ("gas", UINT64),
        ("gas_cost", UINT64), ("op", STRING, False), ("pc", UINT64),
        ("refund_counter", UINT64), ("memory", STRING), ("stack", STRING),
        ("storage", STRING), ("return_data", BINARY), ("chain_id", UINT64),
    ),
    # default excludes memory/stack/storage (geth_opcodes.rs:33-36)
    defaults=("block_number", "transaction_hash", "transaction_index",
              "trace_address", "depth", "error", "gas", "gas_cost", "op",
              "pc", "refund_counter", "return_data", "chain_id"),
    sort=("block_number", "transaction_index"),
))

register(DatasetSpec(
    name="javascript_traces",
    aliases=("js_traces",),
    columns=_cols(
        # datasets/javascript_traces.rs:8-14
        ("block_number", UINT32), ("transaction_index", UINT32),
        ("transaction_hash", BINARY), ("output", STRING, False),
        ("chain_id", UINT64),
    ),
    sort=("block_number", "transaction_index"),
))

register(DatasetSpec(
    name="vm_traces",
    aliases=("opcode_traces",),
    columns=_cols(
        # datasets/vm_traces.rs:8-23
        ("block_number", UINT32), ("transaction_hash", BINARY),
        ("transaction_index", UINT32), ("pc", UINT64), ("cost", UINT64),
        ("used", UINT64), ("push", BINARY), ("mem_off", UINT32),
        ("mem_data", BINARY), ("storage_key", BINARY),
        ("storage_val", BINARY), ("op", STRING), ("chain_id", UINT64),
    ),
    # vm_traces.rs:32-34
    defaults=("block_number", "transaction_index", "pc", "cost", "used",
              "op", "chain_id"),
    sort=("block_number", "transaction_index", "used"),
))

register(DatasetSpec(
    name="erc20_balances",
    default_blocks="latest",
    columns=_cols(
        ("block_number", UINT32), ("erc20", BINARY), ("address", BINARY),
        ("balance", U256), ("chain_id", UINT64),
    ),
    sort=("block_number", "erc20", "address"),
    required_dims=("address", "contract"),
))
