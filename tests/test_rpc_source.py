"""Online fetch-stage tests with a deterministic fake transport (no
network in this environment; the reference tests the same layer with
a mock IPC server — cli/parse/blocks.rs:394-440)."""

from __future__ import annotations

import pytest

from cryo_spark import plan
from cryo_spark.sources.rpc import (
    FlakyTransportFactory,
    RpcConfig,
    _Pacer,
    fake_transport_factory,
    fetch_blocks,
    work_list_df,
)


def test_fetch_blocks_roundtrip(spark):
    chunks = plan.parse_block_inputs("50:150")
    wl = work_list_df(spark, chunks, n_partitions=4)
    out = fetch_blocks(
        spark, wl, transport_factory=fake_transport_factory
    ).orderBy("block_number")
    rows = out.collect()
    assert len(rows) == 100
    assert rows[0].block_number == 50
    assert rows[0].timestamp == 1_600_000_000 + 12 * 50
    assert rows[0].base_fee_per_gas is None  # pre-1559
    assert rows[-1].base_fee_per_gas == 10**9
    assert rows[-1].gas_used == 21_000 * 149
    assert rows[0].author == bytes([50 % 16]) * 20


def test_fetch_blocks_retries_transient_failures(spark):
    wl = work_list_df(spark, plan.parse_block_inputs("0:10"), n_partitions=1)
    cfg = RpcConfig(max_retries=3, initial_backoff_s=0.01)
    out = fetch_blocks(
        spark, wl, config=cfg, transport_factory=FlakyTransportFactory(2)
    )
    assert out.count() == 10


def test_online_pipeline_fetch_to_chunked_files(spark, tmp_path):
    """Full online path: planner work-list -> mapInPandas fetch (fake
    node) -> chunk-aligned cryo-named files — the lifecycle the
    reference runs per freeze (SURVEY §3.1), as two Spark stages."""
    import os

    from cryo_spark import io as cio

    chunks = plan.subchunk_by_size(plan.parse_block_inputs("0:400"), 100)
    wl = work_list_df(spark, chunks, n_partitions=4)
    fetched = fetch_blocks(spark, wl, transport_factory=fake_transport_factory)
    sink = cio.FileOutput(output_dir=str(tmp_path / "out"), prefix="fakenet")
    res = cio.write_chunked(fetched, "blocks", chunks, sink)
    names = sorted(os.path.basename(p) for p in res["completed_paths"])
    assert names[0] == "fakenet__blocks__00000000_to_00000099.parquet"
    assert len(names) == 4 and res["n_rows"] == 400
    back = spark.read.parquet(res["completed_paths"][2])
    rows = back.orderBy("block_number").collect()
    assert [r.block_number for r in rows] == list(range(200, 300))
    assert rows[0].timestamp == 1_600_000_000 + 12 * 200


def test_pacer_gives_up_after_max_retries():
    cfg = RpcConfig(max_retries=2, initial_backoff_s=0.001)
    pacer = _Pacer(cfg)
    calls = {"n": 0}

    def always_fail(method, params):
        calls["n"] += 1
        raise ConnectionError("down")

    with pytest.raises(ConnectionError):
        pacer.call(always_fail, "eth_getBlockByNumber", ["0x1", False])
    assert calls["n"] == 3  # initial + 2 retries


def test_pacer_rate_limit_spacing():
    import time

    cfg = RpcConfig(requests_per_second=100)
    pacer = _Pacer(cfg)
    t0 = time.monotonic()
    for _ in range(5):
        pacer.call(lambda m, p: {}, "eth_getBlockByNumber", [])
    assert time.monotonic() - t0 >= 0.04  # 5 calls at 100 rps >= 40ms


def test_pacer_batch_charges_per_inner_request(monkeypatch):
    """A batch POST charges the token bucket for every inner request
    it carries (CU-metered providers meter per inner request): 10
    requests at rps=100 must advance the bucket by 0.1s whether sent
    as 10 singles or 2 batches of 5."""
    import cryo_spark.sources.rpc as rpcmod

    monkeypatch.setattr(rpcmod.time, "sleep", lambda s: None)
    monkeypatch.setattr(rpcmod.time, "monotonic", lambda: 0.0)

    def transport(method, params):
        return {}

    transport.batch = lambda reqs: [{} for _ in reqs]
    reqs = [("eth_getBlockByNumber", [hex(i), False]) for i in range(10)]
    pacer = rpcmod._Pacer(RpcConfig(requests_per_second=100, batch_size=5))
    pacer.call_many(transport, reqs)
    assert pacer._next_ok == pytest.approx(0.1)
    single = rpcmod._Pacer(RpcConfig(requests_per_second=100, batch_size=1))
    single.call_many(transport, reqs)
    assert single._next_ok == pytest.approx(0.1)


def test_rpc_url_resolution(monkeypatch):
    # cli/parse/source.rs:72-108: arg > ETH_RPC_URL > error; bare
    # hosts get an http:// prefix
    from cryo_spark.sources.rpc import RpcConfig, resolve_rpc_url

    monkeypatch.delenv("ETH_RPC_URL", raising=False)
    assert resolve_rpc_url("https://node.example") == "https://node.example"
    assert resolve_rpc_url("node.example:8545") == "http://node.example:8545"
    with pytest.raises(ValueError, match="ETH_RPC_URL"):
        resolve_rpc_url(None)
    monkeypatch.setenv("ETH_RPC_URL", "envnode:1234")
    assert resolve_rpc_url(None) == "http://envnode:1234"
    assert RpcConfig.from_env().url == "http://envnode:1234"



def test_fetch_logs_ranged_with_pushdown(spark):
    """C4 online: eth_getLogs ranged requests capped at
    inner_request_size; address/topic0 predicates pushed into the
    RPC filter (rpc_params.rs:99-131)."""
    from cryo_spark.sources.rpc import (
        RangeCappedFakeFactory, RpcConfig, fetch_logs, work_list_df,
    )
    from cryo_spark.plan import BlockChunk

    cfg = RpcConfig(inner_request_size=10)
    wl = work_list_df(spark, [BlockChunk(start=0, end=99)])
    out = fetch_logs(
        spark, wl, cfg, transport_factory=RangeCappedFakeFactory(10)
    )
    rows = out.collect()
    # block n emits n % 3 logs, but only when it has txs (n % 4 > 0)
    assert len(rows) == sum(n % 3 for n in range(100) if n % 4)
    assert {r["chain_id"] for r in rows} == {1}
    # topic0 pushdown: only k=1 logs (topic0 = 0x01*32) survive, and
    # the node (fake) did the filtering, not Spark
    t0 = bytes([1]) * 32
    filtered = fetch_logs(
        spark, wl, cfg, transport_factory=RangeCappedFakeFactory(10), topic0=t0
    ).collect()
    assert len(filtered) == sum(1 for n in range(100) if n % 3 == 2 and n % 4)
    assert all(bytes(r["topic0"]) == t0 for r in filtered)


def test_pacer_compute_units_backoff_floor(monkeypatch):
    """CU-based retry throttle (RetryBackoffLayer, source.rs:17-21):
    a failed call backs off >= one request's compute units."""
    import cryo_spark.sources.rpc as rpcmod

    sleeps = []
    monkeypatch.setattr(rpcmod.time, "sleep", lambda s: sleeps.append(s))
    cfg = RpcConfig(
        initial_backoff_s=0.001, compute_units_per_second=200,
        compute_units_per_request=100, max_retries=2,
    )
    state = {"n": 0}

    def flaky(method, params):
        state["n"] += 1
        if state["n"] == 1:
            raise ConnectionError("boom")
        return {}

    rpcmod._Pacer(cfg).call(flaky, "eth_getBlockByNumber", [])
    assert sleeps and sleeps[0] >= 0.5  # 100 CU / 200 CU/s


def test_mesc_resolution(monkeypatch, tmp_path):
    """MESC-first resolution (cli/parse/source.rs:74-108): endpoint
    name and chain-id queries, profile/global defaults, file and env
    configs, DISABLED mode, and the ETH_RPC_URL fallthrough."""
    import json

    from cryo_spark.sources.rpc import resolve_rpc_url

    cfg = {
        "mesc_version": "0.2.0",
        "default_endpoint": "local_eth",
        "endpoints": {
            "local_eth": {"name": "local_eth", "url": "localhost:8545",
                          "chain_id": "1"},
            "llama_op": {"name": "llama_op", "url": "https://op.llamarpc.com",
                         "chain_id": "10"},
        },
        "network_defaults": {"10": "llama_op"},
        "profiles": {"cryo": {"default_endpoint": "llama_op"}},
    }
    p = tmp_path / "mesc.json"
    p.write_text(json.dumps(cfg))
    monkeypatch.delenv("ETH_RPC_URL", raising=False)
    monkeypatch.setenv("MESC_MODE", "PATH")
    monkeypatch.setenv("MESC_PATH", str(p))
    # endpoint-name query; bare host gets the http:// prefix
    assert resolve_rpc_url("local_eth") == "http://localhost:8545"
    # chain-id query via network_defaults
    assert resolve_rpc_url("10") == "https://op.llamarpc.com"
    # no query -> "cryo" profile default wins over global default
    assert resolve_rpc_url() == "https://op.llamarpc.com"
    # unmatched query falls through to the literal URL
    assert resolve_rpc_url("http://other:1234") == "http://other:1234"
    # env-JSON config mode
    monkeypatch.setenv("MESC_MODE", "ENV")
    monkeypatch.delenv("MESC_PATH")
    monkeypatch.setenv("MESC_ENV", json.dumps({**cfg, "profiles": {}}))
    assert resolve_rpc_url() == "http://localhost:8545"  # global default
    # DISABLED: back to env-var resolution
    monkeypatch.setenv("MESC_MODE", "DISABLED")
    monkeypatch.setenv("ETH_RPC_URL", "http://fallback:8545")
    assert resolve_rpc_url() == "http://fallback:8545"
    # broken config is non-fatal (reference eprintln-and-continue)
    monkeypatch.setenv("MESC_MODE", "PATH")
    monkeypatch.setenv("MESC_PATH", str(tmp_path / "missing.json"))
    assert resolve_rpc_url() == "http://fallback:8545"
