"""S9 crawler analog: retry, rate limiting, shard-resumable fetch."""

import os
import shutil
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from pubmed_and_method_ray.sources.crawler import (
    FetchShard,
    deterministic_fetcher,
    fetch_corpus,
    read_corpus,
)

OUT = "/tmp/test_crawl"


def _ids_ds(n=200, dupes=True):
    ids = list(range(n)) + (list(range(0, n, 3)) if dupes else [])
    return rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())}))


class TestFetchShard:
    def test_retry_and_payload(self):
        stage = FetchShard()
        out = stage(pa.table({"doc_id": pa.array(range(300), pa.int64())}))
        df = out.to_pandas()
        assert (df.status == "ok").all()
        # payload = md5 hex * (1 + id % 7)
        assert (df.n_bytes == 32 * (1 + df.doc_id % 7)).all()
        # ~1/16 of ids need a retry (md5 hex starts with '0')
        assert set(df.attempts) == {1, 2}
        import hashlib

        exp2 = {
            i for i in range(300)
            if hashlib.md5(str(i).encode()).hexdigest()[0] == "0"
        }
        assert set(df[df.attempts == 2].doc_id) == exp2

    def test_permanent_failure_marked(self):
        def always_fail(i, attempt):
            raise ConnectionError("down")

        stage = FetchShard(fetcher=always_fail, max_retries=2)
        df = stage(pa.table({"doc_id": pa.array([1, 2], pa.int64())})).to_pandas()
        assert (df.status == "failed").all()
        assert (df.attempts == 3).all()
        assert (df.n_bytes == 0).all()

    def test_rate_limit_bounds_throughput(self):
        stage = FetchShard(max_per_sec=50)
        stage.bucket.tokens = 0.0  # drain the initial burst allowance
        t0 = time.perf_counter()
        stage(pa.table({"doc_id": pa.array(range(20), pa.int64())}))
        elapsed = time.perf_counter() - t0
        assert elapsed >= 20 / 50 * 0.8  # ≥ ~0.32s for 20 fetches at 50/s


class TestFetchCorpus:
    def setup_method(self):
        shutil.rmtree(OUT, ignore_errors=True)

    def test_fetch_dedupes_and_reads_back(self):
        n_written = fetch_corpus(_ids_ds(120), OUT, n_shards=6)
        assert n_written == 6
        df = read_corpus(OUT).to_pandas()
        assert sorted(df.doc_id) == list(range(120))  # duplicates collapsed
        assert (df.status == "ok").all()

    def test_resume_skips_completed_shards(self):
        fetch_corpus(_ids_ds(120), OUT, n_shards=6)
        # full rerun: nothing to do
        assert fetch_corpus(_ids_ds(120), OUT, n_shards=6) == 0
        # lose one shard -> exactly one refetches
        victim = sorted(d for d in os.listdir(OUT) if d.startswith("shard="))[2]
        shutil.rmtree(os.path.join(OUT, victim))
        assert fetch_corpus(_ids_ds(120), OUT, n_shards=6) == 1
        df = read_corpus(OUT).to_pandas()
        assert sorted(df.doc_id) == list(range(120))

    def test_incomplete_shard_refetched(self):
        fetch_corpus(_ids_ds(120), OUT, n_shards=6)
        victim = sorted(d for d in os.listdir(OUT) if d.startswith("shard="))[0]
        os.remove(os.path.join(OUT, victim, "_manifest"))  # simulate crash
        assert fetch_corpus(_ids_ds(120), OUT, n_shards=6) == 1
        assert sorted(read_corpus(OUT).to_pandas().doc_id) == list(range(120))

    def test_failed_ids_reenqueued_on_resume(self):
        """Permanently-failed rows must not be sealed as done: the next
        run re-enqueues the shard and refetches ONLY the failed ids
        (reference resume semantics — re-attempt anything not
        successfully written)."""

        def flaky(i, attempt):
            if i % 2 == 0:
                raise ConnectionError("down")
            return deterministic_fetcher(i, 1)

        fetch_corpus(
            _ids_ds(60, dupes=False), OUT, n_shards=4,
            fetcher=flaky, max_retries=1,
        )
        df = read_corpus(OUT).to_pandas()
        assert (df[df.doc_id % 2 == 0].status == "failed").all()
        assert (df[df.doc_id % 2 == 1].status == "ok").all()

        def only_failed(i, attempt):
            if i % 2 != 0:
                raise AssertionError(f"refetched already-ok id {i}")
            return deterministic_fetcher(i, 1)

        # every shard had failures, so all 4 re-enqueue — but the ok
        # rows are kept, not refetched (only_failed raises otherwise)
        assert fetch_corpus(
            _ids_ds(60, dupes=False), OUT, n_shards=4, fetcher=only_failed
        ) == 4
        df = read_corpus(OUT).to_pandas()
        assert (df.status == "ok").all()
        assert sorted(df.doc_id) == list(range(60))
        # and now it is fully resumed: nothing to do
        assert fetch_corpus(_ids_ds(60, dupes=False), OUT, n_shards=4) == 0


class TestDatasetSink:
    """fetch_corpus_ds: no worker-local file I/O — persistence flows
    through Dataset.write_parquet + an injected pyarrow filesystem, so
    it works on clusters WITHOUT shared POSIX storage."""

    OUT2 = "/tmp/test_crawl_ds"

    def _clean(self):
        shutil.rmtree(self.OUT2, ignore_errors=True)

    def test_fetch_read_back_matches_files_sink(self):
        from pubmed_and_method_ray.sources.crawler import (
            fetch_corpus_ds,
            read_corpus_ds,
        )

        self._clean()
        n = fetch_corpus_ds(_ids_ds(), self.OUT2, n_shards=6)
        assert n == 6
        df = read_corpus_ds(self.OUT2).to_pandas().sort_values("doc_id")
        assert len(df) == 200  # dupes dropped
        assert (df.status == "ok").all()
        assert (df.n_bytes == 32 * (1 + df.doc_id % 7)).all()
        # resume: all manifests sealed ok -> nothing refetched
        assert fetch_corpus_ds(_ids_ds(), self.OUT2, n_shards=6) == 0

    def test_all_io_through_injected_filesystem(self, tmp_path):
        """Simulates non-shared storage: every byte must flow through
        the injected filesystem handle (rooted at the 'driver' dir);
        the raw relative path must never materialize in the worker or
        driver cwd."""
        from pyarrow import fs as pafs

        from pubmed_and_method_ray.sources.crawler import (
            fetch_corpus_ds,
            read_corpus_ds,
        )

        driver_root = str(tmp_path / "driver_store")
        os.makedirs(driver_root)
        subfs = pafs.SubTreeFileSystem(driver_root, pafs.LocalFileSystem())
        n = fetch_corpus_ds(_ids_ds(60), "corpus", n_shards=4, filesystem=subfs)
        assert n == 4
        # data landed under the injected root, not under any cwd path
        assert sorted(os.listdir(driver_root)) == ["corpus"]
        assert not os.path.exists("corpus")
        df = read_corpus_ds("corpus", filesystem=subfs).to_pandas()
        assert len(df) == 60
        assert (df.status == "ok").all()
        # resume through the same handle
        assert fetch_corpus_ds(_ids_ds(60), "corpus", n_shards=4, filesystem=subfs) == 0

    def test_failed_shard_refetched_whole(self):
        from pubmed_and_method_ray.sources.crawler import (
            fetch_corpus_ds,
            read_corpus_ds,
        )

        self._clean()

        calls: dict[int, int] = {}

        def flaky(doc_id: int, attempt: int) -> bytes:
            return deterministic_fetcher(doc_id, attempt)

        fetch_corpus_ds(_ids_ds(100, dupes=False), self.OUT2, n_shards=4)
        # corrupt one manifest to claim failures -> that shard refetches
        shard_dir = os.path.join(self.OUT2, "shard=2")
        with open(os.path.join(shard_dir, "_manifest")) as f:
            n_rows = int(f.read().split()[0])
        with open(os.path.join(shard_dir, "_manifest"), "w") as f:
            f.write(f"{n_rows} 3")
        assert fetch_corpus_ds(_ids_ds(100, dupes=False), self.OUT2, n_shards=4) == 1
        df = read_corpus_ds(self.OUT2).to_pandas()
        assert len(df) == 100
        assert (df.status == "ok").all()
        with open(os.path.join(shard_dir, "_manifest")) as f:
            assert f.read().split()[1] == "0"
