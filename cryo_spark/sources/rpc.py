"""Online fetch stage: JSON-RPC over a planned work-list DataFrame.

Mirrors the reference source layer
(/root/reference/crates/freeze/src/types/sources.rs):
- provider + retry/backoff + rate limit + request semaphore
  (sources.rs:119-150, cli/parse/source.rs:14-71) → per-executor
  token bucket + bounded concurrency inside a ``mapInPandas`` stage,
- 40+ typed fetch methods (sources.rs:229-983) → request builders +
  response flatteners per dataset; the landed rows match the replay
  source's raw-table schemas exactly, so every downstream transform
  is identical online and offline.

The Spark scheduler replaces the reference's tokio chunk/request task
tree (C5): one work-list partition = one task; within a task the
fetcher batches rows and paces requests. No network is available in
this environment — the transport is injectable and unit tests use a
deterministic fake; the default transport is stdlib urllib.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

Transport = Callable[[str, list], dict]


def _mesc_config() -> dict | None:
    """Load MESC config if enabled (the public MESC standard the
    reference resolves first — cli/parse/source.rs:74-88). Enabled
    when MESC_MODE/MESC_PATH/MESC_ENV is set and mode != DISABLED;
    MESC_ENV holds inline JSON, MESC_PATH (or mode PATH) a JSON file.
    Errors are non-fatal — resolution falls through to ETH_RPC_URL,
    matching the reference's eprintln-and-continue behavior."""
    import os

    mode = os.environ.get("MESC_MODE", "").upper()
    if mode == "DISABLED":
        return None
    try:
        if mode == "ENV" or (not mode and os.environ.get("MESC_ENV")):
            return json.loads(os.environ["MESC_ENV"])
        path = os.environ.get("MESC_PATH")
        if mode == "PATH" and not path:
            return None
        if path:
            with open(path) as f:
                return json.load(f)
    except Exception:
        return None
    return None


def _mesc_endpoint_url(config: dict, query: str | None) -> str | None:
    """Minimal get_endpoint_by_query / get_default_endpoint: an
    explicit query matches an endpoint NAME, then a chain id via
    network_defaults; no query resolves the profile default for
    "cryo" then the global default_endpoint."""
    endpoints = config.get("endpoints") or {}

    def url_of(name):
        ep = endpoints.get(name)
        return ep.get("url") if ep else None

    if query:
        if query in endpoints:
            return url_of(query)
        by_chain = (config.get("network_defaults") or {}).get(query)
        if by_chain:
            return url_of(by_chain)
        return None
    profile = (config.get("profiles") or {}).get("cryo") or {}
    return url_of(profile.get("default_endpoint")
                  or config.get("default_endpoint"))


def resolve_rpc_url(url: str | None = None) -> str:
    """RPC URL resolution (cli/parse/source.rs:72-108): MESC first
    (explicit arg as an endpoint/network query, else the default
    endpoint), then the explicit arg as a literal URL, then the
    ETH_RPC_URL env var, else an error. Bare host[:port] values get
    an http:// prefix."""
    import os

    mesc = _mesc_config()
    resolved = _mesc_endpoint_url(mesc, url) if mesc else None
    if resolved:
        url = resolved
    elif url is None:
        url = os.environ.get("ETH_RPC_URL")
    if not url:
        raise ValueError(
            "must provide an rpc url, set up MESC, or set ETH_RPC_URL"
        )
    if not url.startswith(("http", "ws")) and not url.endswith(".ipc"):
        url = "http://" + url
    return url


@dataclass(frozen=True)
class RpcConfig:
    """sources.rs:105-117 defaults; url via :func:`resolve_rpc_url`
    when constructed through :meth:`from_env`."""

    url: str = "http://localhost:8545"
    max_concurrent_requests: int = 100
    requests_per_second: float | None = None
    max_retries: int = 5
    initial_backoff_s: float = 0.5
    timeout_s: float = 30.0
    # CU-based retry throttle (RetryBackoffLayer's third arg,
    # cli/parse/source.rs:17-21): on failure, back off at least long
    # enough to re-earn one request's compute units
    compute_units_per_second: int | None = None
    compute_units_per_request: int = 100
    # blocks per ranged request (eth_getLogs), sources.rs:110
    inner_request_size: int = 100
    # requests per JSON-RPC batch POST (eth JSON-RPC batching): 1
    # disables batching; typical nodes accept 100-1000. Batching cuts
    # round-trips ~batch_size x for point-lookup-heavy extractions.
    batch_size: int = 1

    @classmethod
    def from_env(cls, url: str | None = None, **kwargs) -> "RpcConfig":
        return cls(url=resolve_rpc_url(url), **kwargs)


def http_transport(config: RpcConfig) -> Transport:  # pragma: no cover - needs network
    import urllib.request

    def _post(payload) -> dict | list:
        req = urllib.request.Request(
            config.url, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=config.timeout_s) as resp:
            return json.loads(resp.read())

    def call(method: str, params: list) -> dict:
        out = _post({"jsonrpc": "2.0", "id": 1, "method": method, "params": params})
        if "error" in out:
            raise RuntimeError(f"rpc error: {out['error']}")
        return out["result"]

    def batch(reqs: list[tuple[str, list]]) -> list:
        """One POST carrying a JSON-RPC batch array; responses are
        matched by id (the spec allows servers to reorder)."""
        payload = [
            {"jsonrpc": "2.0", "id": i, "method": m, "params": p}
            for i, (m, p) in enumerate(reqs)
        ]
        by_id = {}
        for out in _post(payload):
            if "error" in out:
                raise RuntimeError(f"rpc error: {out['error']}")
            by_id[out["id"]] = out["result"]
        return [by_id[i] for i in range(len(reqs))]

    call.batch = batch  # type: ignore[attr-defined]
    return call


class _Pacer:
    """Token-bucket rate limiter + retry/backoff (the per-executor
    analog of governor + RetryBackoffLayer, cli/parse/source.rs:17-40)."""

    def __init__(self, config: RpcConfig):
        self.config = config
        self._next_ok = 0.0

    def call(self, transport: Transport, method: str, params: list,
             weight: int = 1) -> dict:
        cfg = self.config
        if cfg.requests_per_second:
            now = time.monotonic()
            if now < self._next_ok:
                time.sleep(self._next_ok - now)
            self._next_ok = max(now, self._next_ok) + weight / cfg.requests_per_second
        backoff = cfg.initial_backoff_s
        if cfg.compute_units_per_second:
            # RetryBackoffLayer semantics: a failed call waits at
            # least one request's worth of compute units
            backoff = max(
                backoff, cfg.compute_units_per_request / cfg.compute_units_per_second
            )
        for attempt in range(cfg.max_retries + 1):
            try:
                return transport(method, params)
            except Exception:
                if attempt == cfg.max_retries:
                    raise
                time.sleep(backoff)
                backoff *= 2
        raise AssertionError("unreachable")

    def call_many(self, transport: Transport, reqs: list[tuple[str, list]]) -> list:
        """Dispatch a request list with JSON-RPC batching when both
        the transport (``.batch``) and the config (``batch_size>1``)
        support it; otherwise a paced per-request loop. A batch POST
        charges the token bucket for EVERY inner request it carries —
        CU-metered providers (most) meter per inner request, not per
        HTTP round-trip, so weighting by 1 would overrun the quota by
        up to batch_size x. A failed batch retries whole — nodes
        treat them atomically."""
        cfg = self.config
        batch = getattr(transport, "batch", None)
        if batch is None or cfg.batch_size <= 1:
            return [self.call(transport, m, p) for m, p in reqs]
        out: list = []
        for i in range(0, len(reqs), cfg.batch_size):
            chunk = reqs[i:i + cfg.batch_size]
            out.extend(self.call(
                lambda _m, _p, c=chunk: batch(c), "batch", [],
                weight=len(chunk),
            ))
        return out


def _hex_to_bytes(h: str | None) -> bytes | None:
    if h is None:
        return None
    h = h[2:] if h.startswith("0x") else h
    if len(h) % 2:
        h = "0" + h
    return bytes.fromhex(h)


def _hex_to_int(h: str | None) -> int | None:
    return None if h is None else int(h, 16)


BLOCK_RAW_SCHEMA = T.StructType(
    [
        T.StructField("block_number", T.IntegerType()),
        T.StructField("block_hash", T.BinaryType()),
        T.StructField("parent_hash", T.BinaryType()),
        T.StructField("author", T.BinaryType()),
        T.StructField("state_root", T.BinaryType()),
        T.StructField("transactions_root", T.BinaryType()),
        T.StructField("receipts_root", T.BinaryType()),
        T.StructField("uncles_hash", T.BinaryType()),
        T.StructField("mix_hash", T.BinaryType()),
        T.StructField("logs_bloom", T.BinaryType()),
        T.StructField("extra_data", T.BinaryType()),
        T.StructField("nonce", T.BinaryType()),
        T.StructField("timestamp", T.IntegerType()),
        T.StructField("gas_used", T.LongType()),
        T.StructField("gas_limit", T.LongType()),
        T.StructField("difficulty", T.LongType()),
        T.StructField("total_difficulty", T.BinaryType()),
        T.StructField("size", T.LongType()),
        T.StructField("base_fee_per_gas", T.LongType()),
        T.StructField("withdrawals_root", T.BinaryType()),
        T.StructField("chain_id", T.LongType()),
    ]
)


def _u256_word(h: str | None) -> bytes | None:
    return None if h is None else int(h, 16).to_bytes(32, "big")


def flatten_block(raw: dict, chain_id: int) -> dict:
    """eth_getBlockByNumber result → one raw-table row, full header
    surface (datasets/blocks.rs process_block flatten) — the landed
    row matches the replay fixture_blocks schema column for column."""
    return {
        "block_number": _hex_to_int(raw.get("number")),
        "block_hash": _hex_to_bytes(raw.get("hash")),
        "parent_hash": _hex_to_bytes(raw.get("parentHash")),
        "author": _hex_to_bytes(raw.get("miner")),
        "state_root": _hex_to_bytes(raw.get("stateRoot")),
        "transactions_root": _hex_to_bytes(raw.get("transactionsRoot")),
        "receipts_root": _hex_to_bytes(raw.get("receiptsRoot")),
        "uncles_hash": _hex_to_bytes(raw.get("sha3Uncles")),
        "mix_hash": _hex_to_bytes(raw.get("mixHash")),
        "logs_bloom": _hex_to_bytes(raw.get("logsBloom")),
        "extra_data": _hex_to_bytes(raw.get("extraData")),
        "nonce": _hex_to_bytes(raw.get("nonce")),
        "timestamp": _hex_to_int(raw.get("timestamp")),
        "gas_used": _hex_to_int(raw.get("gasUsed")),
        "gas_limit": _hex_to_int(raw.get("gasLimit")),
        "difficulty": _hex_to_int(raw.get("difficulty")),
        "total_difficulty": _u256_word(raw.get("totalDifficulty")),
        "size": _hex_to_int(raw.get("size")),
        "base_fee_per_gas": _hex_to_int(raw.get("baseFeePerGas")),
        "withdrawals_root": _hex_to_bytes(raw.get("withdrawalsRoot")),
        "chain_id": chain_id,
    }


def fetch_blocks(
    spark: SparkSession,
    work_list: DataFrame,
    config: RpcConfig | None = None,
    transport_factory: Callable[[RpcConfig], Transport] | None = None,
    chain_id: int = 1,
) -> DataFrame:
    """Fetch block headers for every ``block_number`` in the work-list
    (one request per row, paced per executor). The result schema
    matches the replay raw table, so ``datasets.blocks.transform``
    applies unchanged.

    ``transport_factory`` is resolved on the EXECUTOR (it must be
    picklable); default is the stdlib HTTP transport.
    """
    cfg = config or RpcConfig()
    factory = transport_factory or http_transport

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        transport = factory(cfg)
        pacer = _Pacer(cfg)
        for pdf in batches:
            reqs = [
                ("eth_getBlockByNumber", [hex(int(bn)), False])
                for bn in pdf["block_number"]
            ]
            rows = [
                flatten_block(raw, chain_id)
                for raw in pacer.call_many(transport, reqs)
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in BLOCK_RAW_SCHEMA.fields])

    return work_list.select("block_number").mapInPandas(run, BLOCK_RAW_SCHEMA)


LOG_RAW_SCHEMA = T.StructType(
    [
        T.StructField("block_number", T.IntegerType()),
        T.StructField("transaction_index", T.IntegerType()),
        T.StructField("log_index", T.IntegerType()),
        T.StructField("transaction_hash", T.BinaryType()),
        T.StructField("block_hash", T.BinaryType()),
        T.StructField("address", T.BinaryType()),
        T.StructField("topic0", T.BinaryType()),
        T.StructField("topic1", T.BinaryType()),
        T.StructField("topic2", T.BinaryType()),
        T.StructField("topic3", T.BinaryType()),
        T.StructField("data", T.BinaryType()),
        T.StructField("chain_id", T.LongType()),
    ]
)


def flatten_log(raw: dict, chain_id: int) -> dict:
    """eth_getLogs entry → one raw-table row (logs.rs process_logs)."""
    topics = raw.get("topics") or []
    t = [_hex_to_bytes(x) for x in topics] + [None] * (4 - len(topics))
    return {
        "block_number": _hex_to_int(raw.get("blockNumber")),
        "transaction_index": _hex_to_int(raw.get("transactionIndex")),
        "log_index": _hex_to_int(raw.get("logIndex")),
        "transaction_hash": _hex_to_bytes(raw.get("transactionHash")),
        "block_hash": _hex_to_bytes(raw.get("blockHash")),
        "address": _hex_to_bytes(raw.get("address")),
        "topic0": t[0], "topic1": t[1], "topic2": t[2], "topic3": t[3],
        "data": _hex_to_bytes(raw.get("data")),
        "chain_id": chain_id,
    }


def fetch_logs(
    spark: SparkSession,
    work_list: DataFrame,
    config: RpcConfig | None = None,
    transport_factory: Callable[[RpcConfig], Transport] | None = None,
    chain_id: int = 1,
    address: bytes | None = None,
    topic0: bytes | None = None,
) -> DataFrame:
    """Ranged eth_getLogs fetch (C4/P4 online): each task folds its
    contiguous block slice into ceil(n / inner_request_size)-many
    ranged requests — the reference's `--inner-request-size` request
    re-splitting (number_chunk.rs:52-74) — and the address/topic0
    predicates are pushed into the RPC filter object
    (rpc_params.rs:99-131), so filtering happens node-side exactly as
    the landed-table path pushes them into the parquet scan."""
    cfg = config or RpcConfig()
    factory = transport_factory or http_transport
    flt_base: dict = {}
    if address is not None:
        flt_base["address"] = "0x" + address.hex()
    if topic0 is not None:
        flt_base["topics"] = ["0x" + topic0.hex()]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        transport = factory(cfg)
        pacer = _Pacer(cfg)
        cols = [f.name for f in LOG_RAW_SCHEMA.fields]
        for pdf in batches:
            if not len(pdf):
                continue
            nums = sorted(int(b) for b in pdf["block_number"])
            rows: list[dict] = []
            i = 0
            while i < len(nums):
                # longest contiguous run within inner_request_size
                j = i
                while (
                    j + 1 < len(nums)
                    and nums[j + 1] == nums[j] + 1
                    and (j + 1 - i) < cfg.inner_request_size
                ):
                    j += 1
                flt = {
                    **flt_base,
                    "fromBlock": hex(nums[i]),
                    "toBlock": hex(nums[j]),
                }
                for raw in pacer.call(transport, "eth_getLogs", [flt]):
                    rows.append(flatten_log(raw, chain_id))
                i = j + 1
            yield pd.DataFrame(rows, columns=cols)

    return work_list.select("block_number").mapInPandas(run, LOG_RAW_SCHEMA)


def fake_transport_factory(config: RpcConfig) -> Transport:
    """Deterministic fake node for offline tests (the reference tests
    its source layer against a mock IPC server the same way —
    cli/parse/blocks.rs:394-440): block n has timestamp
    1600000000+12n, gasUsed 21000*n, miner derived from n."""

    def call(method: str, params: list) -> dict:
        if method == "eth_getLogs":
            flt = params[0]
            lo, hi = int(flt["fromBlock"], 16), int(flt["toBlock"], 16)
            want_addr = flt.get("address")
            want_t0 = (flt.get("topics") or [None])[0]
            out = []
            for n in range(lo, hi + 1):
                # block n emits n%3 logs — but ONLY when it has
                # transactions to emit them from (the full fake models
                # n%4 txs per block, and a 0-tx block cannot log);
                # log k attaches to tx (k mod ntx), so every log's
                # transactionHash decodes to a transaction the per-tx
                # methods actually serve
                ntx = n % 4
                for k in range(n % 3 if ntx else 0):
                    addr = "0x" + ((n + k) % 7).to_bytes(1, "big").hex() * 20
                    t0 = "0x" + bytes([k]).hex() * 32
                    if want_addr is not None and addr != want_addr:
                        continue
                    if want_t0 is not None and t0 != want_t0:
                        continue
                    txi = k % ntx
                    out.append({
                        "blockNumber": hex(n),
                        "transactionIndex": hex(txi),
                        "logIndex": hex(k),
                        # same (block, index) hash encoding as the full
                        # fake's transactions
                        "transactionHash": "0x" + ((n * 1000 + txi).to_bytes(8, "big") * 4).hex(),
                        "blockHash": "0x" + (n.to_bytes(4, "big") * 8).hex(),
                        "address": addr,
                        "topics": [t0],
                        "data": "0x" + bytes([n % 256]).hex() * 32,
                    })
            return out
        if method == "eth_blockNumber":
            return hex(9999)  # fake chain tip
        if method != "eth_getBlockByNumber":
            raise ValueError(f"fake node does not serve {method}")
        n = int(params[0], 16)
        return {
            "number": hex(n),
            "hash": "0x" + (n.to_bytes(4, "big") * 8).hex(),
            "parentHash": "0x" + ((n - 1).to_bytes(4, "big", signed=True) * 8).hex(),
            "miner": "0x" + (n % 16).to_bytes(1, "big").hex() * 20,
            "stateRoot": "0x" + (n % 7).to_bytes(1, "big").hex() * 32,
            "transactionsRoot": "0x" + (n % 11).to_bytes(1, "big").hex() * 32,
            "receiptsRoot": "0x" + (n % 13).to_bytes(1, "big").hex() * 32,
            "sha3Uncles": "0x" + "1d" * 32,
            "mixHash": "0x" + (n % 5).to_bytes(1, "big").hex() * 32,
            "logsBloom": "0x" + "00" * 256,
            "nonce": "0x" + (n % 9).to_bytes(1, "big").hex() * 8,
            "difficulty": hex(0 if n >= 100 else 10**12 + n),
            "totalDifficulty": hex(10**15 + n),
            "size": hex(500 + 13 * (n % 97)),
            "withdrawalsRoot": ("0x" + (n % 3).to_bytes(1, "big").hex() * 32)
            if n >= 100 else None,
            "timestamp": hex(1_600_000_000 + 12 * n),
            "gasUsed": hex(21_000 * n),
            "gasLimit": hex(30_000_000),
            "baseFeePerGas": hex(10**9) if n >= 100 else None,
            "extraData": "0x",
        }

    return call


class RangeCappedFakeFactory:
    """fake_transport_factory wrapper enforcing eth_getLogs range
    discipline: every request's span must be <= cap blocks (tests the
    inner_request_size re-splitting executor-side)."""

    def __init__(self, cap: int):
        self.cap = cap

    def __call__(self, config: RpcConfig) -> Transport:
        inner = fake_transport_factory(config)

        def call(method: str, params: list):
            if method == "eth_getLogs":
                flt = params[0]
                span = int(flt["toBlock"], 16) - int(flt["fromBlock"], 16) + 1
                if span > self.cap:
                    raise AssertionError(f"range {span} exceeds cap {self.cap}")
            return inner(method, params)

        return call


class FlakyTransportFactory:
    """fake_transport_factory wrapper failing the first N calls per
    executor — exercises the retry/backoff path."""

    def __init__(self, fail_first: int):
        self.fail_first = fail_first

    def __call__(self, config: RpcConfig) -> Transport:
        inner = fake_transport_factory(config)
        state = {"n": 0}

        def call(method: str, params: list) -> dict:
            state["n"] += 1
            if state["n"] <= self.fail_first:
                raise ConnectionError("flaky")
            return inner(method, params)

        return call


def work_list_df(spark: SparkSession, chunks, n_partitions: int | None = None) -> DataFrame:
    """Block work-list DataFrame from planner chunks: the fetch
    stage's input, partitioned so each task holds a contiguous range
    (one output file per chunk downstream)."""
    from pyspark.sql import functions as F

    dfs = []
    for c in chunks:
        if c.numbers is not None:
            dfs.append(
                spark.createDataFrame(
                    [(int(n),) for n in c.numbers], "block_number int"
                )
            )
        else:
            dfs.append(
                spark.range(c.start, c.end + 1).select(
                    F.col("id").cast("int").alias("block_number")
                )
            )
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    if n_partitions:
        out = out.repartitionByRange(n_partitions, "block_number")
    return out
