"""The remote-fetch seam over a REAL http:// socket (loopback).

The reference reads working parquet/Excel over HTTP from a bucket mirror
(reference data_engine.py:242-251, external_data_cleaner.py:34-109). The
sandbox blocks the internet but not loopback, so a localhost http.server
proves the default urllib fetcher's http scheme and the external
registry's url-type dataset path end-to-end — previously only file://
was exercised (S3 row in SURVEY §2.1).
"""

import os
import sys
import threading
from functools import partial
from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hbsir_old_spark.sources.acquire import download  # noqa: E402
from hbsir_old_spark.sources.external import ExternalDataRegistry  # noqa: E402


class _Server:
    def __init__(self, directory: str):
        handler = partial(SimpleHTTPRequestHandler, directory=directory)
        # port 0: the OS picks a free port, so parallel test runs never race
        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), handler)
        self.thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self.thread.start()

    @property
    def url(self) -> str:
        host, port = self.httpd.server_address[:2]
        return f"http://{host}:{port}"

    def stop(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()


def test_download_over_real_http(tmp_path):
    serve = tmp_path / "serve"
    serve.mkdir()
    payload = b"Year,CPI\n1400,100.0\n"
    (serve / "raw.csv").write_bytes(payload)
    server = _Server(str(serve))
    try:
        dest = tmp_path / "fetched.csv"
        download(f"{server.url}/raw.csv", str(dest))
        assert dest.read_bytes() == payload
    finally:
        server.stop()


def test_external_registry_url_dataset_over_http_with_save_through(spark, tmp_path):
    serve = tmp_path / "serve"
    serve.mkdir()
    (serve / "prices.csv").write_text("Year,CPI\n1400,100.0\n1401,145.5\n")
    server = _Server(str(serve))
    try:
        meta = {"sci": {"cpi": {"url": f"{server.url}/prices.csv"}}}
        reg = ExternalDataRegistry(
            spark,
            meta,
            cleaners={"sci_cpi": pd.read_csv},
            cache_dir=str(tmp_path / "cache"),
        )
        df = reg.load("sci.cpi")
        rows = {r["Year"]: r["CPI"] for r in df.collect()}
        assert rows == {1400: 100.0, 1401: 145.5}
        # save-through: the cleaned frame landed as parquet under cache_dir
        assert os.path.exists(tmp_path / "cache" / "sci.cpi.parquet")
    finally:
        # stop the server BEFORE the second load: a cache hit must never
        # touch the socket (the save-through contract)
        server.stop()
    again = reg.load("sci.cpi")
    assert again.count() == 2
