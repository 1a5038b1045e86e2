"""Pair-generation cross-implementation oracle (the reference's own test
pattern: SQL pair-gen checked against an independent Python script,
/root/reference/database/and_datasets.sql:87-105). Brute-force itertools
per (host, any-band-agreement) must equal the pipeline output exactly —
including when mega-block salting kicks in."""

import itertools

import pytest
import ray.data as rd

from pubmed_and_method_ray.sources.pages import pages_from_documents_batch
from pubmed_and_method_ray.stages.blocking import block_census, generate_pairs
from pubmed_and_method_ray.stages.mention_prep import NormalizeMentions, extract_stage

import pyarrow as pa


def _mentions_table(n_docs=40, expand_k=4):
    batch = pa.Table.from_pydict(
        {
            "doc_id": list(range(n_docs)),
            "text": [
                " ".join(f"w{i % 7}t{j}" for j in range(50)) for i in range(n_docs)
            ],
            "lang": ["en"] * n_docs,
        }
    )
    pages = pages_from_documents_batch(batch, expand_k=expand_k, n_hosts=5)
    norm = NormalizeMentions()
    return norm(extract_stage(pages))


def _brute_force_pairs(mentions: pa.Table) -> set[tuple[str, str]]:
    rows = list(
        zip(
            mentions["url"].to_pylist(),
            mentions["host"].to_pylist(),
            mentions["bands"].to_pylist(),
        )
    )
    expected = set()
    for (u1, h1, b1), (u2, h2, b2) in itertools.combinations(rows, 2):
        if h1 == h2 and any(x == y for x, y in zip(b1, b2)):
            expected.add((min(u1, u2), max(u1, u2)))
    return expected


@pytest.fixture(scope="module")
def mentions():
    return _mentions_table()


class TestPairGeneration:
    def _run(self, mentions, n_max):
        ds = rd.from_arrow(mentions)
        pairs = generate_pairs(ds, n_max=n_max, keep_gold=True)
        t = pairs.select_columns(["url_1", "url_2", "label"]).to_pandas()
        got = set(zip(t["url_1"], t["url_2"]))
        assert len(got) == len(t), "duplicate pairs emitted"
        return got, t

    def test_matches_brute_force_unsalted(self, mentions):
        got, _ = self._run(mentions, n_max=100_000)
        assert got == _brute_force_pairs(mentions)

    def test_matches_brute_force_salted(self, mentions):
        """Tiny n_max forces S>1 salting on every real block; coverage and
        dedup must still be exact (the hard part of SURVEY.md §7.4)."""
        got, _ = self._run(mentions, n_max=8)
        assert got == _brute_force_pairs(mentions)

    def test_canonical_order(self, mentions):
        _, t = self._run(mentions, n_max=64)
        assert (t["url_1"] < t["url_2"]).all()

    def test_labels_match_entity_equality(self, mentions):
        ds = rd.from_arrow(mentions)
        pairs = generate_pairs(ds, n_max=100_000, keep_gold=True)
        t = pairs.select_columns(["url_1", "url_2", "label"]).to_pandas()
        ent = dict(
            zip(mentions["url"].to_pylist(), mentions["entity_id"].to_pylist())
        )
        for u1, u2, lab in zip(t["url_1"], t["url_2"], t["label"]):
            assert lab == (1 if ent[u1] == ent[u2] else 0)

    def test_gold_entities_connected_by_blocking(self, mentions):
        """Blocking recall on planted clusters: transitive clustering only
        needs every entity's pages to form ONE connected component in the
        candidate-pair graph (the SONG same-lastname-block property;
        direct-pair misses healed by transitivity are fine)."""
        blocked = _brute_force_pairs(mentions)
        ent = dict(
            zip(mentions["url"].to_pylist(), mentions["entity_id"].to_pylist())
        )
        urls_by_ent = {}
        for u, e in ent.items():
            urls_by_ent.setdefault(e, []).append(u)

        direct_total = direct_hit = 0
        for e, urls in urls_by_ent.items():
            urls = sorted(urls)
            for u1, u2 in itertools.combinations(urls, 2):
                direct_total += 1
                direct_hit += (u1, u2) in blocked
            # connectivity within the entity through blocked pairs
            if len(urls) > 1:
                comp = {urls[0]}
                frontier = [urls[0]]
                while frontier:
                    x = frontier.pop()
                    for y in urls:
                        if y not in comp and (min(x, y), max(x, y)) in blocked:
                            comp.add(y)
                            frontier.append(y)
                assert comp == set(urls), f"entity {e} split by blocking"
        assert direct_total > 0
        assert direct_hit / direct_total >= 0.90  # direct-pair recall floor


class TestPartitionScaling:
    def test_partition_counts_grow_past_64(self):
        """Exchange sizing must scale with the CLUSTER, not cap at a
        constant tuned for this 32-cpu box (at 100 TB a 64-way cap means
        ~1.6 TB per pair partition)."""
        from pubmed_and_method_ray.rayutil import shuffle_partitions
        from pubmed_and_method_ray.stages.blocking import (
            PAIR_BUCKET_BYTES,
            n_pair_buckets,
        )

        # small-box behavior: two pair buckets per CPU (measured — see
        # n_pair_buckets docstring tuning history)
        assert shuffle_partitions(cpus=32) == 32
        assert n_pair_buckets(cpus=32) == 64
        # big simulated clusters blow straight past 64
        assert shuffle_partitions(cpus=1024) == 1024
        assert shuffle_partitions(factor=2, cpus=4096) == 8192
        assert n_pair_buckets(cpus=2048) == 4096
        # data-aware: known volume grows buckets past the CPU count so a
        # partition block stays bounded at ~PAIR_BUCKET_BYTES
        assert n_pair_buckets(cpus=32, n_bytes=PAIR_BUCKET_BYTES * 100) == 100
        assert n_pair_buckets(cpus=32, n_bytes=1 << 20) == 64
        # rows-aware interpolation inside the [cpus, 2*cpus] clamp
        # (measured operating points: ~200k mentions -> ~cpus buckets,
        # ~400k -> 2*cpus; tiny inputs floor at one per CPU)
        assert n_pair_buckets(cpus=32, n_rows=199_826) == 34
        assert n_pair_buckets(cpus=32, n_rows=399_714) == 64
        assert n_pair_buckets(cpus=32, n_rows=1_210) == 32

    def test_sized_partitions_bytes_target(self):
        from pubmed_and_method_ray.rayutil import sized_partitions

        # small exchange shrinks below one-per-cpu
        assert sized_partitions(10_000, hi=64) == 2
        # byte volume grows the count past the cpu cap
        assert (
            sized_partitions(10_000, hi=64, n_bytes=(256 << 20) * 500) == 500
        )

    def test_pairs_green_at_forced_high_partitions(self, mentions, monkeypatch):
        """Brute-force pair oracle must hold when the exchange runs with
        far more partitions than CPUs or data (mostly-empty partitions +
        salting both active)."""
        import pubmed_and_method_ray.stages.blocking as blocking

        monkeypatch.setattr(blocking, "n_pair_buckets", lambda **kw: 48)
        ds = rd.from_arrow(mentions)
        pairs = blocking.generate_pairs(ds, n_max=8, keep_gold=True)
        t = pairs.select_columns(["url_1", "url_2"]).to_pandas()
        got = set(zip(t["url_1"], t["url_2"]))
        assert len(got) == len(t), "duplicate pairs emitted"
        assert got == _brute_force_pairs(mentions)


class TestPartitionReps:
    def test_reps_are_hash_bijective(self):
        """partition_reps(n) must place logical bucket i in Ray's output
        partition i under the exact hash the 2.49 keyed partitioner uses
        (hash of the 1-tuple of the pyarrow int32 scalar, mod n). This
        pins the optimization's contract — if a Ray/pyarrow upgrade
        changes the hash, this test flags it (behavior degrades to an
        arbitrary distribution, never to wrong results)."""
        from pubmed_and_method_ray.rayutil import partition_reps

        for n in (4, 32, 48, 257):
            reps = partition_reps(n)
            assert len(reps) == n
            assert len(set(reps)) == n
            for i, r in enumerate(reps):
                assert hash((pa.scalar(r, pa.int32()),)) % n == i

    def test_exchange_fills_every_output_block(self):
        """With every logical bucket populated, the remapped keyed
        repartition must yield exactly one NON-EMPTY block per bucket —
        no idle CPUs during the score wave (pre-remap: raw 0..n-1 ids
        collided mod n, measured 27/32 non-empty at bench scale)."""
        import numpy as np
        import ray

        from pubmed_and_method_ray.rayutil import partition_reps

        n = 12
        reps = np.asarray(partition_reps(n), dtype=np.int64)
        t = pa.table(
            {
                "x": pa.array(np.arange(10 * n), pa.int64()),
                "bucket": pa.array(
                    reps[np.arange(10 * n) % n], pa.int32()
                ),
            }
        )
        out = rd.from_arrow(t).repartition(num_blocks=n, keys=["bucket"])
        sizes = [
            ray.get(ref).num_rows for ref in out.to_arrow_refs()
        ]
        assert sorted(sizes) == [10] * n


class TestHeavyHostPacking:
    def test_lpt_pack_balances_quadratic_work(self):
        import numpy as np

        from pubmed_and_method_ray.stages.blocking import pack_heavy_hosts

        # zipf-ish host sizes; hash assignment would lump the head
        counts = np.array([500, 400, 300, 200, 100, 100, 90, 80], np.int64)
        keys = np.arange(len(counts), dtype=np.uint64)
        buckets = pack_heavy_hosts(keys, counts, 4)
        assert buckets.min() >= 0 and buckets.max() < 4
        w = counts.astype(float) ** 2
        loads = np.bincount(buckets, weights=w, minlength=4)
        # LPT guarantee: max load within 4/3 of optimum,
        # optimum >= max(mean load, largest single host)
        assert loads.max() <= (4 / 3) * max(w.sum() / 4, w.max()) + 1
        # the two biggest hosts must land in different buckets
        assert buckets[0] != buckets[1]


class TestSkewCensus:
    def test_distributed_census_matches_driver_merge(self, mentions):
        """The off-driver (keyed-exchange) census path must agree exactly
        with the driver-merge path: only over-threshold hosts, sorted."""
        from pubmed_and_method_ray.stages.blocking import skew_table_fast

        ds = rd.from_arrow(mentions)
        k_drv, n_drv = skew_table_fast(ds, n_max=8, sample_mod=1, distributed=False)
        k_dst, n_dst = skew_table_fast(ds, n_max=8, sample_mod=1, distributed=True)
        assert (k_drv == k_dst).all()
        assert (n_drv == n_dst).all()
        assert len(k_drv) > 0  # n_max=8 makes every real host heavy


class TestBlockCensus:
    def test_census_counts(self, mentions):
        ds = rd.from_arrow(mentions)
        from pubmed_and_method_ray.functions.simhash import DEFAULT_BANDS

        census = block_census(ds).to_pandas()
        # every mention contributes exactly N_BANDS keys
        assert census["count()"].sum() == mentions.num_rows * DEFAULT_BANDS
        # recompute one key's count independently
        hosts = mentions["host"].to_pylist()
        bands = mentions["bands"].to_pylist()
        from collections import Counter

        c = Counter(
            f"{h}|{i}|{int(v):x}"
            for h, bs in zip(hosts, bands)
            for i, v in enumerate(bs)
        )
        got = dict(zip(census["block_key"], census["count()"]))
        assert got == dict(c)
