"""CommonCrawl-shape volume receipt for the HTTP(S) range transport
(round 17, judge task #7): the loopback "200 adjacent records = 1 GET"
number was a best case on ~1 KB members. This stress serves a
crawl-shaped archive (realistic 5-50 KB gzip members) over a local
counting Range server and fetches a MIXED-adjacency selection — an
adjacent time-slice run, a scattered one-host slice, and the union —
with coalescing on vs off. Reports GET count, byte bill, and wall per
shape. Numbers go to SCALE.md.

Usage: python tools/stress_http_range.py [files] [records_per_file]
(default 4 x 500 = 2000 records, ~40 MB archive)
"""

from __future__ import annotations

import gzip
import http.server
import json as _json
import os
import random
import sys
import tempfile
import threading
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from cryo_spark import get_spark  # noqa: E402


def build_archive(root: str, files: int, records: int) -> str:
    """CDX-indexed .warc.gz archives whose records are independent
    gzip members with REALISTIC sizes: paragraph counts drawn
    deterministically so members land ~5-50 KB compressed (the
    CommonCrawl member-size band), captures spread over 8 hosts."""
    rng = random.Random(1717)
    lines = []
    for fidx in range(files):
        pos, blobs = 0, []
        for r in range(records):
            i = fidx * records + r
            host = f"host{i % 8}.stress"
            # 60..600 paragraphs of ~190 raw bytes -> ~5..50 KB gzip
            # (prose with per-paragraph entropy so gzip can't collapse)
            n_par = rng.randint(60, 600)
            body = "<html><body>" + "".join(
                f"<p>Capture {i} paragraph {k} token "
                + " ".join(
                    f"w{(i * 31 + k * 7 + j) % 9973}" for j in range(24)
                )
                + " with enough ordinary prose to extract.</p>"
                for k in range(n_par)
            ) + "</body></html>"
            payload = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + body.encode()
            )
            sep = b"\r\n"
            rec = (
                b"WARC/1.0" + sep
                + b"WARC-Type: response" + sep
                + f"WARC-Target-URI: https://{host}/p{i}".encode() + sep
                + b"WARC-Date: 2026-01-01T00:00:00Z" + sep
                + f"Content-Length: {len(payload)}".encode() + sep
                + sep + payload + sep + sep
            )
            m = gzip.compress(rec)
            lines.append(
                f"stress,{host.split('.')[0]})/p{i} 20260101000000 "
                + _json.dumps(
                    dict(
                        url=f"https://{host}/p{i}", mime="text/html",
                        status="200", languages="eng",
                        length=str(len(m)), offset=str(pos),
                        filename=f"s{fidx:02d}.warc.gz",
                    )
                )
            )
            blobs.append(m)
            pos += len(m)
        with open(os.path.join(root, f"s{fidx:02d}.warc.gz"), "wb") as f:
            f.write(b"".join(blobs))
    idx = os.path.join(root, "stress.cdx")
    with open(idx, "w") as f:
        f.write("\n".join(lines))
    return idx


class Counter:
    def __init__(self):
        self.gets = 0
        self.bytes = 0
        self.lock = threading.Lock()

    def reset(self):
        with self.lock:
            self.gets, self.bytes = 0, 0


def make_handler(root: str, counter: Counter):
    class H(http.server.BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"
        # without this the loopback wall measures Nagle+delayed-ACK
        # stalls (~40 ms/GET), not the transport; real archive hosts
        # are RTT-bound, which the per-GET count already captures
        disable_nagle_algorithm = True

        def log_message(self, *a):
            pass

        def do_GET(self):
            p = os.path.join(root, self.path.lstrip("/"))
            if not os.path.isfile(p):
                self.send_error(404)
                return
            data = open(p, "rb").read()
            rng = self.headers.get("Range")
            if rng:
                spec = rng.split("=", 1)[1]
                lo_s, hi_s = spec.split("-", 1)
                lo = int(lo_s)
                hi = int(hi_s) if hi_s else len(data) - 1
                body = data[lo:hi + 1]
                self.send_response(206)
                self.send_header(
                    "Content-Range", f"bytes {lo}-{hi}/{len(data)}"
                )
            else:
                body = data
                self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            with counter.lock:
                counter.gets += 1
                counter.bytes += len(body)

    return H


def main() -> None:
    from pyspark.sql import functions as F

    from cryo_spark.sources.cdx import fetch_cdx_records, read_cdx

    files = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    records = int(sys.argv[2]) if len(sys.argv) > 2 else 500

    spark = get_spark(app_name="stress_http_range")
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="stress_http_")
    t0 = time.time()
    idx = build_archive(root, files, records)
    sizes = [
        os.path.getsize(os.path.join(root, f"s{f:02d}.warc.gz"))
        for f in range(files)
    ]
    n_rec = files * records
    print(
        f"archive: {files} files x {records} records = {n_rec} members, "
        f"{sum(sizes) / 1e6:.1f} MB total, mean member "
        f"{sum(sizes) / n_rec / 1024:.1f} KB "
        f"(built {time.time() - t0:.1f}s)"
    )

    counter = Counter()
    srv = http.server.ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(root, counter)
    )
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}/"

    cdx = read_cdx(spark, idx)
    # selection shapes, mixed adjacency like a real re-extraction:
    # - time-slice: records 100..260 of file 0 (ADJACENT run)
    # - one-host: host3 captures (every 8th record — SCATTERED)
    # - union of both (the realistic mixed case)
    slice_ids = [f"p{i}" for i in range(100, 260)]
    adjacent = cdx.filter(
        (F.col("filename") == "s00.warc.gz")
        & F.element_at(F.split(F.col("url"), "/"), -1).isin(slice_ids)
    )
    scattered = cdx.filter(F.col("url").contains("host3."))
    mixed = adjacent.unionByName(scattered).dropDuplicates(
        ["filename", "offset"]
    )

    for label, frame in (
        ("adjacent_160", adjacent),
        ("scattered_1-in-8", scattered),
        ("mixed_union", mixed),
    ):
        sel = frame.select("offset", "length").collect()
        want_bytes = sum(r.length for r in sel)
        for coalesce in (0, 8 << 20):
            counter.reset()
            t0 = time.time()
            n = fetch_cdx_records(
                spark, frame, warc_root=base, coalesce_bytes=coalesce
            ).count()
            dt = time.time() - t0
            print(
                f"{label:18s} coalesce={'8MiB' if coalesce else 'off '} "
                f"records={n:4d} GETs={counter.gets:4d} "
                f"bytes={counter.bytes / 1e6:7.2f}MB "
                f"(selected {want_bytes / 1e6:.2f}MB) wall={dt:5.2f}s"
            )
            assert n == len(sel), (n, len(sel))
            # the byte bill NEVER exceeds the selected ranges —
            # coalescing only merges strictly-adjacent ranges
            assert counter.bytes == want_bytes, (
                counter.bytes, want_bytes,
            )
    srv.shutdown()
    import shutil

    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
