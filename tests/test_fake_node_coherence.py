"""Property tests for the fake node's cross-method coherence.

The by-hash fetchers are tested by comparing per-tx answers against
per-block answers, so the fake must be SELF-CONSISTENT across its
methods the way a real node is — a log must reference a transaction
the node serves, a receipt must exist exactly for served txs, and
the per-tx trace/replay/debug methods must slice their per-block
answers. These run without Spark (pure transport calls), so they
sweep far more blocks than the Spark-level parity tests can.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from cryo_spark.sources.rpc import RpcConfig
from cryo_spark.sources.rpc_families import full_fake_transport_factory

CALL = full_fake_transport_factory(RpcConfig())


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=5000))
def test_logs_reference_served_transactions(n):
    """Every eth_getLogs entry's transactionHash must resolve through
    eth_getTransactionByHash to a tx in the same block with the same
    index — and a 0-tx block must emit no logs (the round-5 coherence
    bug class)."""
    logs = CALL("eth_getLogs", [{"fromBlock": hex(n), "toBlock": hex(n)}])
    ntx = len(CALL("eth_getBlockByNumber", [hex(n), True])["transactions"])
    if ntx == 0:
        assert logs == []
    for lg in logs:
        tx = CALL("eth_getTransactionByHash", [lg["transactionHash"]])
        assert tx is not None, lg["transactionHash"]
        assert int(tx["blockNumber"], 16) == n
        assert tx["transactionIndex"] == lg["transactionIndex"]


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=5000))
def test_receipts_exist_exactly_for_served_txs(n):
    """eth_getBlockReceipts zips positionally with the block's txs;
    eth_getTransactionReceipt agrees entry for entry, and its logs
    are the block's logs sliced by transactionIndex."""
    blk = CALL("eth_getBlockByNumber", [hex(n), True])
    receipts = CALL("eth_getBlockReceipts", [hex(n)])
    assert len(receipts) == len(blk["transactions"])
    blk_logs = CALL("eth_getLogs", [{"fromBlock": hex(n), "toBlock": hex(n)}])
    for k, (tx, rc) in enumerate(zip(blk["transactions"], receipts)):
        assert rc["transactionHash"] == tx["hash"]
        by_hash = CALL("eth_getTransactionReceipt", [tx["hash"]])
        assert by_hash == rc
        want = [lg for lg in blk_logs if int(lg["transactionIndex"], 16) == k]
        assert rc["logs"] == want


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=5000), st.integers(min_value=0, max_value=3))
def test_per_tx_methods_slice_per_block_answers(n, k):
    """trace_transaction / trace_replayTransaction /
    debug_traceTransaction return exactly the per-block entry for the
    tx's position — or null for unknown hashes."""
    h = "0x" + ((n * 1000 + k).to_bytes(8, "big") * 4).hex()
    served = k < len(CALL("eth_getBlockByNumber", [hex(n), True])["transactions"])
    trace = CALL("trace_transaction", [h])
    replay = CALL("trace_replayTransaction", [h, ["stateDiff"]])
    debug = CALL("debug_traceTransaction", [h, {"tracer": "callTracer"}])
    if not served:
        assert trace is None and replay is None and debug is None
        assert CALL("eth_getTransactionByHash", [h]) is None
        return
    blk_traces = CALL("trace_block", [hex(n)])
    assert trace == [t for t in blk_traces if t["transactionPosition"] == k]
    replays = CALL("trace_replayBlockTransactions", [hex(n), ["stateDiff"]])
    assert replay == replays[k]
    debugs = CALL("debug_traceBlockByNumber", [hex(n), {"tracer": "callTracer"}])
    assert debug == debugs[k]["result"]
