"""End-to-end pipeline tests: F1 ≥ 0.99 acceptance, golden counters,
grouped-split leakage, checkpoint/resume (FIXTURES.md F5, SURVEY.md §5)."""

import json
import os
import shutil

import numpy as np
import pytest
import ray.data as rd

from pubmed_and_method_ray.functions.splits import (
    assert_no_leakage,
    grouped_folds,
    split_group_column,
)
from pubmed_and_method_ray.pipelines.er import run_er_pipeline
from pubmed_and_method_ray.sources import checkpoint as ckpt
from pubmed_and_method_ray.sources.pages import build_pages_dataset

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pages():
    return build_pages_dataset(SF, expand_k=4)


@pytest.fixture(scope="module")
def result(pages):
    return run_er_pipeline(pages, n_max=256)


class TestEndToEnd:
    def test_pairwise_f1_acceptance(self, result):
        assert result["pair_metrics"]["f1"] >= 0.99  # BASELINE.md target

    def test_cluster_f1_acceptance(self, result):
        assert result["cluster_metrics"]["f1"] >= 0.99

    def test_every_page_clustered(self, result, pages):
        assert result["clusters"].count() == pages.count()

    def test_cluster_partition_matches_gold(self, result, pages):
        """Predicted clusters == gold entity partition up to relabeling."""
        gold = pages.select_columns(["url", "entity_id"]).to_pandas()
        pred = result["clusters"].to_pandas()
        m = gold.merge(pred, on="url")
        # each gold entity maps to exactly one predicted cluster and
        # each predicted cluster to exactly one entity
        assert (m.groupby("entity_id")["cluster_id"].nunique() == 1).all()
        assert (m.groupby("cluster_id")["entity_id"].nunique() == 1).all()

    def test_scores_deterministic(self, pages, result):
        out2 = run_er_pipeline(pages, n_max=256, model_json=result["model_json"])
        a = (
            result["scored"]
            .select_columns(["url_1", "url_2", "score"])
            .to_pandas()
            .sort_values(["url_1", "url_2"])
            .reset_index(drop=True)
        )
        b = (
            out2["scored"]
            .select_columns(["url_1", "url_2", "score"])
            .to_pandas()
            .sort_values(["url_1", "url_2"])
            .reset_index(drop=True)
        )
        assert (a["url_1"] == b["url_1"]).all()
        assert np.allclose(a["score"], b["score"])


class TestGroupedSplit:
    def test_no_leakage_any_fold(self, result):
        sdf = result["scored"].to_pandas()
        hosts = [u.split("/")[2] for u in sdf["url_1"]]
        groups = split_group_column(hosts)
        for train, test in grouped_folds(groups, n_splits=5):
            assert_no_leakage(groups[train], groups[test])

    def test_leakage_assert_fires(self):
        with pytest.raises(AssertionError):
            assert_no_leakage([1, 2], [2, 3])


class TestCheckpointResume:
    def test_resume_skips_completed_stages(self, pages, tmp_path_factory):
        workdir = str(tmp_path_factory.mktemp("ckpt"))
        out1 = run_er_pipeline(pages, n_max=256, workdir=workdir)
        clusters1 = out1["clusters"].to_pandas()  # snapshot before "crash"
        man1 = ckpt.read_manifest(os.path.join(workdir, "features"))
        assert man1 and man1["complete"] and man1["rows"] > 0
        assert man1["counters"]["pairs"] == man1["rows"]
        assert man1["counters"]["gold_pairs"] > 0
        wrote_at = man1["written_at"]

        # simulate a crash after 'features': later stages lost
        shutil.rmtree(os.path.join(workdir, "scored"))
        shutil.rmtree(os.path.join(workdir, "clusters"))
        out2 = run_er_pipeline(
            pages, n_max=256, workdir=workdir, model_json=out1["model_json"]
        )
        # features stage was NOT recomputed (manifest untouched) and its
        # golden counters survived the resume intact
        man2 = ckpt.read_manifest(os.path.join(workdir, "features"))
        assert man2["written_at"] == wrote_at
        assert man2["counters"] == man1["counters"]
        # identical final clusters
        a = clusters1.sort_values("url").reset_index(drop=True)
        b = out2["clusters"].to_pandas().sort_values("url").reset_index(drop=True)
        assert (a["cluster_id"] == b["cluster_id"]).all()

    def test_changed_input_invalidates_checkpoints(self, pages, tmp_path_factory):
        """Same workdir + DIFFERENT input must recompute, not silently
        reuse stale stages (checkpoint fingerprints fold in the input
        identity — the checkpoint.py contract)."""
        import pyarrow as pa
        import ray.data as rd

        workdir = str(tmp_path_factory.mktemp("ckpt_inv"))
        half_dir = str(tmp_path_factory.mktemp("pages_half"))
        full_dir = str(tmp_path_factory.mktemp("pages_full"))
        full = pages.to_pandas()
        rd.from_pandas(full.iloc[: len(full) // 2]).write_parquet(half_dir)
        rd.from_pandas(full).write_parquet(full_dir)

        out1 = run_er_pipeline(
            rd.read_parquet(half_dir), n_max=256, workdir=workdir, evaluate=False
        )
        n1 = out1["clusters"].count()
        out2 = run_er_pipeline(
            rd.read_parquet(full_dir), n_max=256, workdir=workdir, evaluate=False
        )
        n2 = out2["clusters"].count()
        assert n1 == len(full) // 2
        assert n2 == len(full)  # stale mentions NOT reused

    def test_lost_checkpoint_file_recomputes(self, pages, tmp_path_factory):
        """A manifest-complete stage dir with a missing parquet file must
        recompute instead of resuming with partial data."""
        workdir = str(tmp_path_factory.mktemp("ckpt_lost"))
        run_er_pipeline(pages, n_max=256, workdir=workdir)
        mdir = os.path.join(workdir, "mentions")
        man = ckpt.read_manifest(mdir)
        victim = sorted(man["files"])[0]
        os.remove(os.path.join(mdir, victim))
        assert not ckpt.is_complete(mdir, man["fingerprint"])
        out = run_er_pipeline(pages, n_max=256, workdir=workdir)
        assert out["clusters"].count() == pages.count()

    def test_manifest_lineage_counters(self, pages, tmp_path_factory):
        workdir = str(tmp_path_factory.mktemp("ckpt2"))
        out = run_er_pipeline(pages, n_max=256, workdir=workdir)
        for stage in ["mentions", "features", "scored", "clusters"]:
            man = ckpt.read_manifest(os.path.join(workdir, stage))
            assert man["stage"] == stage
            assert man["rows"] == sum(man["files"].values())
            assert man["fingerprint"]
            assert man["counters"], f"{stage} manifest has no golden counters"
        # counters are stage-semantic, not just row counts
        mman = ckpt.read_manifest(os.path.join(workdir, "mentions"))
        assert mman["counters"]["mentions"] == mman["rows"]
        assert 0 < mman["counters"]["distinct_hosts"] <= mman["rows"]
        sman = ckpt.read_manifest(os.path.join(workdir, "scored"))
        sdf = out["scored"].to_pandas()
        assert sman["counters"]["match_edges"] == int((sdf["score"] >= 0.5).sum())
        cman = ckpt.read_manifest(os.path.join(workdir, "clusters"))
        cdf = out["clusters"].to_pandas()
        assert cman["counters"]["nodes"] == len(cdf)
        assert cman["counters"]["clusters"] == cdf["cluster_id"].nunique()


class TestConnectedComponents:
    def test_distributed_matches_driver(self, pages, result):
        from pubmed_and_method_ray.stages.cluster import (
            connected_components_distributed,
            connected_components_driver,
        )
        from pubmed_and_method_ray.stages.features import edges_from_scores

        edges = edges_from_scores(result["scored"], 0.5).materialize()
        drv = connected_components_driver(edges)
        dist = connected_components_distributed(edges).to_pandas()
        got = dict(zip(dist["url"], dist["cluster_id"]))
        assert got == drv  # same minimal-url labels

    def test_distributed_non_ascii_labels(self):
        """Convergence detection must not rely on an ASCII sentinel: labels
        containing codepoints >= U+0080 previously never converged."""
        import ray
        import pyarrow as pa

        from pubmed_and_method_ray.stages.cluster import (
            connected_components_distributed,
        )

        # chain of non-ASCII urls: é < ê < ë, plus a disjoint pair
        t = pa.Table.from_pydict(
            {
                "url_1": ["é", "ê", "ü1"],
                "url_2": ["ê", "ë", "ü2"],
            }
        )
        edges = ray.data.from_arrow(t)
        out = connected_components_distributed(edges, max_rounds=10).to_pandas()
        got = dict(zip(out["url"], out["cluster_id"]))
        assert got == {"é": "é", "ê": "é", "ë": "é", "ü1": "ü1", "ü2": "ü1"}

    def test_distributed_green_at_forced_high_partitions(self, monkeypatch):
        """The distributed path's joins (label-prop messages AND the
        full-mention singleton left-fill) must stay correct when the
        partition count is forced far above CPUs and data — the two
        sites that carried a hard 64-cap until round 5 (mirrors
        test_pairs.test_pairs_green_at_forced_high_partitions)."""
        import ray
        import pyarrow as pa

        import pubmed_and_method_ray.stages.cluster as cluster

        # forced counts must respect the 4-CPU test session: join AND
        # groupby aggregators each reserve 0.25 logical CPU per
        # partition for the exchange lifetime, and a label-prop round
        # holds one of each concurrently (5+6 -> 2.75 CPUs reserved,
        # leaving 1.25 for tasks; 37/41 deadlocks outright)
        monkeypatch.setattr(cluster, "join_partitions", lambda *a, **k: 5)
        monkeypatch.setattr(cluster, "shuffle_partitions", lambda *a, **k: 6)

        # 3 chain components of 4 urls + 100 singleton mentions
        u = [f"u{i:03d}" for i in range(12)]
        edges = ray.data.from_arrow(
            pa.table(
                {
                    "url_1": [u[0], u[1], u[2], u[4], u[5], u[6], u[8], u[9], u[10]],
                    "url_2": [u[1], u[2], u[3], u[5], u[6], u[7], u[9], u[10], u[11]],
                }
            )
        )
        singles = [f"s{i:03d}" for i in range(100)]
        mentions = ray.data.from_arrow(
            pa.table({"url": u + singles, "x": list(range(112))})
        )
        out = cluster.assign_clusters(
            mentions, edges, method="distributed"
        ).to_pandas()
        got = dict(zip(out["url"], out["cluster_id"]))
        want = {x: u[(i // 4) * 4] for i, x in enumerate(u)}
        want.update({s: s for s in singles})
        assert got == want

    def test_distributed_long_chain_both_message_paths(self):
        """An 8-node chain needs ~7 propagation rounds with shrinking
        frontiers: the default run exercises the broadcast-frontier
        message path (every round past the first fits the budget), and
        frontier_broadcast_max=0 forces the dense nbrs-join path every
        round — both must reach the same min-label fixpoint."""
        import ray
        import pyarrow as pa

        from pubmed_and_method_ray.stages.cluster import (
            connected_components_distributed,
        )

        n = 8
        u = [f"c{i:02d}" for i in range(n)]
        t = pa.Table.from_pydict({"url_1": u[:-1], "url_2": u[1:]})
        want = {x: u[0] for x in u}
        for budget in (2_000_000, 0):
            out = connected_components_distributed(
                ray.data.from_arrow(t), frontier_broadcast_max=budget
            ).to_pandas()
            assert dict(zip(out["url"], out["cluster_id"])) == want, budget

    def test_distributed_star_all_three_round_tiers(self):
        """A star graph walks every round tier in one run: round 0 is
        the dense join (frontier=None), round 1 has a 1-node frontier
        whose min-reduced messages (100 receivers) overflow the budget
        of 50 (broadcast-msgs + union+groupby fallback), round 2 has a
        99-node frontier past the budget (dense join again)."""
        import ray
        import pyarrow as pa

        from pubmed_and_method_ray.stages.cluster import (
            connected_components_distributed,
        )

        leaves = [f"a{i:02d}" for i in range(100)]
        t = pa.Table.from_pydict(
            {"url_1": ["z"] * 100, "url_2": leaves}
        )
        out = connected_components_distributed(
            ray.data.from_arrow(t), frontier_broadcast_max=50
        ).to_pandas()
        want = {x: "a00" for x in leaves + ["z"]}
        assert dict(zip(out["url"], out["cluster_id"])) == want

    def test_distributed_consumes_edges_once(self):
        """The (possibly lazy) edge dataset's upstream must execute
        exactly once: the CC loop seeds everything from the materialized
        neighbor list. Consuming edges twice re-executes the whole fused
        pair-gen/featurize/score exchange in the streaming production
        path (measured as ~2x flagship CC wall-time at 2M pages)."""
        import ray
        import pyarrow as pa

        from pubmed_and_method_ray.stages.cluster import (
            connected_components_distributed,
        )

        @ray.remote
        class Counter:
            def __init__(self):
                self.n = 0

            def inc(self):
                self.n += 1

            def get(self):
                return self.n

        counter = Counter.remote()
        t = pa.table({"url_1": ["a", "b"], "url_2": ["b", "c"]})

        def counting(batch: pa.Table) -> pa.Table:
            ray.get(counter.inc.remote())
            return batch

        edges = ray.data.from_arrow(t).map_batches(
            counting, batch_format="pyarrow"
        )
        out = connected_components_distributed(edges).to_pandas()
        assert dict(zip(out["url"], out["cluster_id"])) == {
            "a": "a",
            "b": "a",
            "c": "a",
        }
        assert ray.get(counter.get.remote()) == 1

    def test_distributed_int_node_ids(self):
        """Generic edge/node columns: int64 doc ids instead of url strings."""
        import ray
        import pyarrow as pa

        from pubmed_and_method_ray.stages.cluster import (
            connected_components_distributed,
        )

        t = pa.Table.from_pydict(
            {"a": pa.array([1, 2, 10], pa.int64()), "b": pa.array([2, 3, 11], pa.int64())}
        )
        edges = ray.data.from_arrow(t)
        out = connected_components_distributed(
            edges, edge_cols=("a", "b"), node_col="doc_id", label_col="root"
        ).to_pandas()
        got = dict(zip(out["doc_id"], out["root"]))
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
