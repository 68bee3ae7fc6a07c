"""OnlineSource: route raw-table reads to live JSON-RPC fetch stages.

The dataset transforms consume raw tables through
``cryo_spark.sources.raw``; offline that is the replay parquet lake,
online it is one of the typed fetchers in :mod:`rpc` /
:mod:`rpc_families`. ``api.collect``/``api.freeze`` accept
``source=OnlineSource(...)`` and activate it for the duration of the
call — the same mechanism the reference uses to swap its fetch layer
under every dataset (sources.rs Source is passed into each
dataset's collect_by_block).

Scale shape: the block work-list is partitioned by contiguous range
(one fetch task per range); point-lookup families build the
block x dim-value product work-list (reference C4 param-set
expansion). Fetched frames are memoized per raw-table name and
persisted, so MultiDatatype groups sharing a fetch (meta.rs:23-39)
hit the network ONCE regardless of how many transforms consume the
table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cryo_spark.sources import rpc, rpc_families as fam


class OnlineSource:
    """Live-fetch raw-table provider.

    Parameters
    ----------
    chunks: planner block chunks (plan.parse_block_inputs output) —
        the fetch work-list; required for per-block families.
    addresses / slots / contracts / call_datas: dim value lists for
        the point-lookup families (accounts, storage, calls,
        trace_calls) — the reference requires the same dims
        (partitions.rs:8-33).
    js_tracer: user tracer source for the js_traces family.
    include_receipts: pass False to elide receipt requests when no
        receipt-borne column is selected (transactions.rs:124-135).

    Current limits: the transactions time dimension (``txs=...``,
    per-hash lookups) and timestamp chunk resolution need a block
    work-list, so they run offline only; an online ``collect`` of a
    "latest"-default dataset must pass explicit blocks (the offline
    tip probe reads the landed lake). Both raise clear errors rather
    than fetching the wrong thing.
    """

    def __init__(
        self,
        chunks=None,
        *,
        config: rpc.RpcConfig | None = None,
        transport_factory=None,
        chain_id: int = 1,
        addresses: list[bytes] | None = None,
        slots: list[bytes] | None = None,
        contracts: list[bytes] | None = None,
        call_datas: list[bytes] | None = None,
        js_tracer: str | None = None,
        include_receipts: bool = True,
        n_partitions: int | None = None,
    ):
        self.chunks = chunks
        self.config = config
        self.transport_factory = transport_factory
        self.chain_id = chain_id
        self.addresses = addresses
        self.slots = slots
        self.contracts = contracts
        self.call_datas = call_datas
        self.js_tracer = js_tracer
        self.include_receipts = include_receipts
        self.n_partitions = n_partitions
        self._cache: dict[str, DataFrame] = {}
        self._adopted = False

    _PER_BLOCK = {
        "blocks", "transactions", "logs", "traces", "state_diffs",
        "state_reads", "opcodes", "js_traces",
    }
    _POINT = {"accounts", "storage", "calls", "trace_calls"}

    def serves(self, name: str) -> bool:
        return name in self._PER_BLOCK or name in self._POINT

    # -- work lists --------------------------------------------------

    def _block_wl(self, spark: SparkSession) -> DataFrame:
        if not self.chunks:
            raise ValueError("OnlineSource needs block chunks for this family")
        n = self.n_partitions or max(len(self.chunks), 1)
        return rpc.work_list_df(spark, self.chunks, n_partitions=n)

    def _product_wl(self, spark: SparkSession, dims: dict[str, list[bytes]]) -> DataFrame:
        """block x dim-values product (reference C4 param-set
        expansion): small dim lists broadcast onto the block
        work-list, so the product never shuffles."""
        wl = self._block_wl(spark)
        for col, values in dims.items():
            if not values:
                raise ValueError(f"OnlineSource needs `{col}` values for this family")
            vals = spark.createDataFrame(
                [(bytes(v),) for v in values], f"{col} binary"
            )
            wl = wl.crossJoin(F.broadcast(vals))
        return wl

    # -- dispatch ----------------------------------------------------

    def raw(self, spark: SparkSession, name: str) -> DataFrame:
        if name in self._cache:
            return self._cache[name]
        kw = dict(
            config=self.config, transport_factory=self.transport_factory,
            chain_id=self.chain_id,
        )
        if name == "blocks":
            df = rpc.fetch_blocks(spark, self._block_wl(spark), **kw)
        elif name == "logs":
            df = rpc.fetch_logs(spark, self._block_wl(spark), **kw)
        elif name == "transactions":
            df = fam.fetch_transactions(
                spark, self._block_wl(spark),
                include_receipts=self.include_receipts, **kw,
            )
        elif name == "traces":
            df = fam.fetch_traces(spark, self._block_wl(spark), **kw)
        elif name == "state_diffs":
            df = fam.fetch_state_diffs(spark, self._block_wl(spark), **kw)
        elif name == "state_reads":
            df = fam.fetch_state_reads(spark, self._block_wl(spark), **kw)
        elif name == "opcodes":
            df = fam.fetch_opcodes(spark, self._block_wl(spark), **kw)
        elif name == "js_traces":
            if not self.js_tracer:
                raise ValueError("OnlineSource needs js_tracer for js_traces")
            df = fam.fetch_js_traces(
                spark, self._block_wl(spark), self.js_tracer, **kw
            )
        elif name == "accounts":
            wl = self._product_wl(spark, {"address": self.addresses})
            df = fam.fetch_accounts(spark, wl, **kw)
        elif name == "storage":
            wl = self._product_wl(
                spark, {"address": self.addresses, "slot": self.slots}
            )
            df = fam.fetch_storage(spark, wl, **kw)
        elif name == "calls":
            wl = self._product_wl(
                spark, {"contract": self.contracts, "call_data": self.call_datas}
            )
            df = fam.fetch_calls(spark, wl, **kw)
        elif name == "trace_calls":
            wl = self._product_wl(
                spark,
                {"tx_to_address": self.contracts, "tx_call_data": self.call_datas},
            )
            df = fam.fetch_trace_calls(spark, wl, **kw)
        else:  # pragma: no cover - serves() guards
            raise KeyError(name)
        # memoize + persist: every transform consuming this raw reuses
        # ONE fetch (the MultiDatatype shared-scan guarantee online)
        df = df.persist()
        self._cache[name] = df
        return df

    def adopt_chunks(self, chunks) -> None:
        """Called by the planner (api._adopt_chunks_into_active_source)
        with the block chunks of the CURRENT collect/freeze. First call
        seeds the fetch work-list; a later call with a DIFFERENT range
        invalidates the memoized fetches so a reused source never
        serves a stale block range. Caller-seeded chunks (set in the
        constructor) are the caller's contract and never overridden."""
        if self.chunks is None:
            self.chunks = chunks
            self._adopted = True
        elif self._adopted and list(chunks) != list(self.chunks):
            self.unpersist()
            self.chunks = chunks

    def unpersist(self) -> None:
        for df in self._cache.values():
            df.unpersist()
        self._cache.clear()
