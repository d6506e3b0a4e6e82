"""Dedup + similarity operators: correctness vs independent brute force."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from maplibre_tile_spec_spark.operators import dedup, similarity
from maplibre_tile_spec_spark.sources import tables


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    base = tables.load(spark, sf_dir, "documents")
    # inject known near-duplicates: copy 5 docs with one token changed
    dup = (
        base.filter(F.col("doc_id") < 5)
        .select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" extra")).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
    )
    exact = base.filter(F.col("doc_id") < 3).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    return base.unionByName(dup).unionByName(exact).cache()


class TestExactDedup:
    def test_exact_copies_grouped(self, docs):
        out = dedup.exact_dedup(docs)
        dupes = out.filter(F.col("n_copies") > 1).collect()
        assert len(dupes) >= 3  # the injected exact copies
        assert all(r.rep_doc_id < 3 for r in dupes if r.n_copies == 2)


class TestMinhashLsh:
    def test_exact_dups_always_candidates(self, docs):
        pairs = {(r.doc_a, r.doc_b) for r in dedup.lsh_candidate_pairs(docs).collect()}
        for i in range(3):
            assert (i, i + 200000) in pairs  # identical text ⇒ identical signature
        # near-dups (one appended token) should mostly collide on ≥1 band
        near = sum(1 for i in range(5) if (i, i + 100000) in pairs)
        assert near >= 3

    def test_fast_family_agrees_on_exact_dups(self, docs):
        pairs = {(r.doc_a, r.doc_b) for r in dedup.lsh_candidate_pairs(docs, fast=True).collect()}
        for i in range(3):
            assert (i, i + 200000) in pairs


class TestNgramJaccard:
    def _brute(self, rows, k=3, threshold=0.2):
        def shingles(text):
            toks = text.strip().lower().split()
            return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

        sets = {r.doc_id: shingles(r.text) for r in rows if len(r.text.strip().split()) >= k}
        expected = set()
        ids = sorted(sets)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                inter = len(sets[a] & sets[b])
                if inter and inter / (len(sets[a]) + len(sets[b]) - inter) >= threshold:
                    expected.add((a, b))
        return expected

    def test_skewed_boilerplate_shingle(self, spark):
        """One boilerplate shingle shared by EVERY doc must not blow up the
        candidate join (prefix filtering pushes max-df shingles out of the
        prefixes) and must not change the exact result."""
        boiler = "terms of service apply"
        rows = [
            (i, f"{boiler} unique{i} alpha{i} beta{i} gamma{i} delta{i}") for i in range(200)
        ] + [
            (1000, f"{boiler} shared body of text here"),
            (1001, f"{boiler} shared body of text here extra"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {(r.doc_a, r.doc_b) for r in dedup.ngram_jaccard_pairs(docs, threshold=0.2).collect()}
        expected = self._brute(docs.collect())
        assert got == expected
        assert (1000, 1001) in got
        # the 200 boilerplate-only docs share only the common shingles;
        # none reaches jaccard 0.2 with the others
        assert all(a >= 1000 for a, _ in got)
        # VERDICT r4 #4: the PPJoin+ length+positional filters measurably cut
        # the verified-candidate count vs prefix-filter-only on this skew
        _, s1, p1, cand_plain = dedup._ngram_jaccard_build(
            docs, "text", "doc_id", 3, 0.2, positional_filter=False
        )
        _, s2, p2, cand_pos = dedup._ngram_jaccard_build(docs, "text", "doc_id", 3, 0.2)
        n_plain, n_pos = cand_plain.count(), cand_pos.count()
        s1.unpersist(), s2.unpersist(), p1.unpersist(), p2.unpersist()
        print(f"ngram candidates: prefix-only={n_plain} +positional={n_pos}")
        assert n_pos < n_plain
        assert got <= {(a, b) for a, b in ((r.doc_a, r.doc_b) for r in cand_pos.collect())}

    def test_matches_bruteforce_on_corpus(self, docs):
        got = {(r.doc_a, r.doc_b) for r in dedup.ngram_jaccard_pairs(docs, threshold=0.2).collect()}
        expected = self._brute(docs.collect())
        assert got == expected


def _union_find(edges, vertices):
    """Brute-force union-find oracle → {id: min id of component}."""
    parent = {v: v for v in vertices}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in vertices}


class TestClusterResolution:
    """VERDICT r4 #1: keep-one dedup output via connected components."""

    def test_components_match_union_find(self, spark, docs):
        pairs = dedup.lsh_candidate_pairs(docs)
        edge_rows = [(r.doc_a, r.doc_b) for r in pairs.collect()]
        verts = {v for e in edge_rows for v in e}
        expect = _union_find(edge_rows, verts)
        got = {r.id: r.comp for r in dedup.connected_components(pairs).collect()}
        assert got == expect
        pairs.unpersist()

    def test_chain_converges_via_pointer_jumping(self, spark):
        # a 400-vertex path has diameter 400: plain min-propagation needs
        # ~400 rounds; pointer jumping resolves it within max_iter=30
        edges = [(i, i + 1) for i in range(400)]
        pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
        got = {r.id: r.comp for r in dedup.connected_components(pairs, max_iter=30).collect()}
        assert got == {i: 0 for i in range(401)}

    def test_multiple_components_and_assign(self, spark):
        edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)]
        pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
        docs = spark.createDataFrame(
            [(i, f"t{i}") for i in [1, 2, 3, 10, 11, 20, 21, 22, 99]],
            "doc_id long, text string",
        )
        assign = {r.doc_id: r.cluster_id for r in dedup.cluster_assign(docs, pairs).collect()}
        assert assign == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20, 99: 99}

    def test_keep_canonical_linear_in_clusters(self, spark):
        """Skewed-cluster shape: one 2000-doc boilerplate cluster emits ONE
        canonical row (pair output would be ~2·10⁶ rows)."""
        n = 2000
        docs = spark.createDataFrame(
            [(i, "boilerplate terms of service text") for i in range(n)]
            + [(n + i, f"unique document number {i}") for i in range(50)],
            "doc_id long, text string",
        )
        # star edges (what LSH gives for an exact-dup cluster is a clique per
        # band bucket; a star is the sparsest connected candidate graph —
        # worst case for propagation depth 2)
        pairs = spark.createDataFrame([(0, i) for i in range(1, n)], "doc_a long, doc_b long")
        out = dedup.dedup_keep_canonical(docs, pairs)
        rows = out.collect()
        assert len(rows) == 1 + 50  # one canonical + 50 singletons
        big = next(r for r in rows if r.cluster_id == 0)
        assert big.n_members == n and big.doc_id == 0
        out.unpersist()

    def test_empty_pairs_all_singletons(self, spark):
        docs = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, text string")
        pairs = spark.createDataFrame([], "doc_a long, doc_b long")
        out = dedup.dedup_keep_canonical(docs, pairs)
        got = {(r.doc_id, r.cluster_id, r.n_members) for r in out.collect()}
        assert got == {(1, 1, 1), (2, 2, 1)}
        out.unpersist()


class TestSimhash:
    def test_near_pairs_match_bruteforce(self, spark, docs):
        sub = docs.filter((F.col("doc_id") < 50) | (F.col("doc_id") >= 100000)).cache()
        got = {
            (r.doc_a, r.doc_b)
            for r in dedup.simhash_near_pairs(sub, max_hamming=3).collect()
        }
        sh = {r.id: r.simhash for r in dedup.simhash(sub).collect()}
        expected = set()
        ids = sorted(sh)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                if bin(sh[a] ^ sh[b]).count("1") <= 3:
                    expected.add((a, b))
        # pigeonhole blocking is exact for hamming ≤ 3 with 4 blocks
        assert got == expected
        assert any((i, i + 200000) in got for i in range(3))


class TestSimilarity:
    @pytest.fixture(scope="class")
    def emb(self, spark, sf_dir):
        return tables.load(spark, sf_dir, "embeddings").cache()

    def test_bruteforce_matches_numpy(self, emb):
        q = emb.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("qid"), "embedding")
        c = emb.select(F.col("vec_id").alias("cid"), "embedding")
        got = {}
        for r in similarity.cosine_topk_bruteforce(q, c, k=3).collect():
            got.setdefault(r.qid, []).append((r.rank, r.cid))
        rows = emb.collect()
        M = np.stack([np.array(r.embedding, dtype=np.float64) for r in rows])
        ids = [r.vec_id for r in rows]
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        sims = Mn @ Mn.T
        for qi, qid in enumerate(ids):
            if qid >= 5:
                continue
            order = sorted(
                (i for i in range(len(ids)) if ids[i] != qid),
                key=lambda i: (-sims[qi, i], ids[i]),
            )
            assert [cid for _, cid in sorted(got[qid])] == [ids[i] for i in order[:3]]

    def test_rademacher_arrow_equals_catalyst(self, spark, emb):
        # the Arrow integer-matmul signature must be bit-identical to the
        # Catalyst expression twin (both are exact integer arithmetic)
        planes = similarity.rademacher_planes(64, 16, 7)
        arrow = {
            r.id: r.sig
            for r in similarity.rademacher_signatures_arrow(emb, planes, "vec_id").collect()
        }
        catalyst = {
            r.vec_id: r.sig
            for r in emb.select(
                "vec_id", similarity.rademacher_signature(F.col("embedding"), planes).alias("sig")
            ).collect()
        }
        assert arrow == catalyst

    def test_ann_catalyst_recall(self, emb):
        q = emb.filter(F.col("vec_id") < 30).select(F.col("vec_id").alias("qid"), "embedding")
        c = emb.select(F.col("vec_id").alias("cid"), "embedding")
        exact = {(r.qid, r.cid) for r in similarity.cosine_topk_bruteforce(q, c, k=3).collect()}
        approx = {
            (r.qid, r.cid) for r in similarity.ann_lsh_topk_catalyst(q, c, dim=64, k=3).collect()
        }
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.9, f"ANN (rademacher) recall too low: {recall}"

    def test_ann_recall(self, emb):
        q = emb.filter(F.col("vec_id") < 30).select(F.col("vec_id").alias("qid"), "embedding")
        c = emb.select(F.col("vec_id").alias("cid"), "embedding")
        exact = {
            (r.qid, r.cid) for r in similarity.cosine_topk_bruteforce(q, c, k=3).collect()
        }
        approx = {
            (r.qid, r.cid) for r in similarity.ann_lsh_topk(q, c, k=3).collect()
        }
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.9, f"ANN recall too low: {recall}"

    def test_signature_determinism(self, emb):
        s1 = {r.id: r.sig for r in similarity.random_hyperplane_signatures(emb).collect()}
        s2 = {
            r.id: r.sig
            for r in similarity.random_hyperplane_signatures(emb.repartition(7)).collect()
        }
        assert s1 == s2


class TestStorageRelease:
    def test_dedup_ops_release_input_sized_caches(self, spark, docs):
        """r2 leak finding: each pair operator must release its persisted
        input-sized intermediates on the query path. Only the output-sized
        result may stay pinned, and unpersisting it returns storage to the
        caller's baseline."""
        spark.catalog.clearCache()
        sc = spark.sparkContext._jsc.sc()
        docs.count()  # the module fixture's own cache
        baseline = sc.getPersistentRDDs().size()
        outs = [
            dedup.lsh_candidate_pairs(docs),
            dedup.ngram_jaccard_pairs(docs, threshold=0.2),
            dedup.simhash_near_pairs(docs),
        ]
        # operators are eager: at this point only the 3 results are pinned
        assert sc.getPersistentRDDs().size() <= baseline + len(outs)
        for o in outs:
            o.unpersist()
        assert sc.getPersistentRDDs().size() <= baseline


class TestIvfAnn:
    @pytest.fixture(scope="class")
    def emb(self, spark, sf_dir):
        return tables.load(spark, sf_dir, "embeddings").cache()

    @staticmethod
    def _clustered(spark, n=600, n_clusters=20, dim=32, noise=0.25):
        """Deterministic clustered vectors — the workload IVF exists for
        (the sf embeddings are uniform on the sphere, where NO coarse
        quantizer can localize neighbors; real embedding spaces cluster)."""
        import numpy as np

        rng = np.random.RandomState(7)
        cents = rng.randn(n_clusters, dim)
        cents /= np.linalg.norm(cents, axis=1, keepdims=True)
        rows = []
        for i in range(n):
            v = cents[i % n_clusters] + noise * rng.randn(dim)
            rows.append((i, [float(x) for x in v]))
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_ivf_recall_vs_bruteforce(self, spark):
        emb = self._clustered(spark)
        q = emb.filter(F.col("vec_id") < 30).select(F.col("vec_id").alias("qid"), "embedding")
        c = emb.select(F.col("vec_id").alias("cid"), "embedding")
        exact = {(r.qid, r.cid) for r in similarity.cosine_topk_bruteforce(q, c, k=3).collect()}
        approx = {
            (r.qid, r.cid)
            for r in similarity.ann_ivf_topk(q, c, k=3, n_cells=16, n_probe=4).collect()
        }
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.9, f"IVF recall too low: {recall}"

    def test_ivf_determinism_across_partitioning(self, spark, emb):
        q = emb.filter(F.col("vec_id") < 10).select(F.col("vec_id").alias("qid"), "embedding")
        c = emb.select(F.col("vec_id").alias("cid"), "embedding")
        r1 = {(r.qid, r.cid, r.rank) for r in similarity.ann_ivf_topk(q, c, k=3).collect()}
        r2 = {
            (r.qid, r.cid, r.rank)
            for r in similarity.ann_ivf_topk(q.repartition(7), c.repartition(5), k=3).collect()
        }
        assert r1 == r2


class TestIncrementalDedup:
    """Incremental dedup against a persisted bucketed band store must be
    indistinguishable from a full recompute over old ∪ new, and must never
    rescan the old documents (VERDICT r5 task #1)."""

    @pytest.fixture(scope="class")
    def split(self, spark, sf_dir):
        d = (
            tables.load(spark, sf_dir, "documents")
            .select(F.col("doc_id").cast("long").alias("doc_id"), "text")
        )
        old = d.filter(F.col("doc_id") % 5 != 0)
        new = d.filter(F.col("doc_id") % 5 == 0)
        return d, old, new

    @staticmethod
    def _standing_state(spark, old, table):
        from maplibre_tile_spec_spark.operators import dedup_incremental as DI

        DI.write_band_store(DI.minhash_band_table(old), table, n_buckets=8)
        pairs = dedup.lsh_candidate_pairs(old)
        cmap = (
            dedup.cluster_assign(old.select("doc_id"), pairs)
            .select(F.col("doc_id").alias("id"), "cluster_id")
            .persist()
        )
        cmap.count()
        pairs.unpersist()
        return cmap

    def test_incremental_equals_full_recompute(self, spark, split):
        from maplibre_tile_spec_spark.operators import dedup_incremental as DI

        d, old, new = split
        table = DI.ensure_store_table(spark, "pytest_inc1")
        cmap = self._standing_state(spark, old, table)
        res = DI.lsh_dedup_incremental(new, spark.table(table), cmap)
        got = {
            (r.id, r.cluster_id)
            for r in DI.updated_assignment(cmap, res).collect()
        }
        full_pairs = dedup.lsh_candidate_pairs(d)
        want = {
            (r.doc_id, r.cluster_id)
            for r in dedup.cluster_assign(d.select("doc_id"), full_pairs).collect()
        }
        full_pairs.unpersist()
        cmap.unpersist()
        # per-document assignment equality — stronger than cluster counts
        assert got == want

    def test_two_batches_with_band_append(self, spark, sf_dir):
        """Batch 2 runs against the store APPENDED with batch 1's bands and
        the remapped cluster map — still equals a from-scratch recompute."""
        from maplibre_tile_spec_spark.operators import dedup_incremental as DI

        d = (
            tables.load(spark, sf_dir, "documents")
            .select(F.col("doc_id").cast("long").alias("doc_id"), "text")
        )
        old = d.filter(F.col("doc_id") % 3 == 0)
        b1 = d.filter(F.col("doc_id") % 3 == 1)
        b2 = d.filter(F.col("doc_id") % 3 == 2)
        table = DI.ensure_store_table(spark, "pytest_inc2")
        cmap = self._standing_state(spark, old, table)
        r1 = DI.lsh_dedup_incremental(b1, spark.table(table), cmap)
        DI.write_band_store(r1.new_bands, table, n_buckets=8, mode="append")
        cmap1 = DI.updated_assignment(cmap, r1).persist()
        cmap1.count()
        r1.new_bands.unpersist()
        spark.catalog.refreshTable(table)
        r2 = DI.lsh_dedup_incremental(b2, spark.table(table), cmap1)
        got = {
            (r.id, r.cluster_id)
            for r in DI.updated_assignment(cmap1, r2).collect()
        }
        full_pairs = dedup.lsh_candidate_pairs(d)
        want = {
            (r.doc_id, r.cluster_id)
            for r in dedup.cluster_assign(d.select("doc_id"), full_pairs).collect()
        }
        full_pairs.unpersist()
        cmap.unpersist()
        cmap1.unpersist()
        assert got == want

    def test_probe_join_store_side_no_exchange(self, spark, split):
        """The store side of the probe join keeps its bucketed layout:
        exactly ONE Exchange (the delta side shuffling to the bucket count)
        and a bucketed file scan — at 100 TB the corpus-side shuffle this
        avoids IS the cost of the batch."""
        from maplibre_tile_spec_spark.operators import dedup_incremental as DI

        _, old, new = split
        table = DI.ensure_store_table(spark, "pytest_inc_plan")
        DI.write_band_store(DI.minhash_band_table(old), table, n_buckets=8)
        old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            nb = DI.minhash_band_table(new)
            j = nb.join(spark.table(table).withColumnRenamed("id", "old_id"), ["band", "sig"])
            plan = j._jdf.queryExecution().toString()
            assert plan.count("Exchange hashpartitioning") == 1, plan
            assert "Bucketed: true" in plan, plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)

    def test_incremental_never_scans_old_documents(self, spark, split, tmp_path):
        """Production shape: standing state on disk (band store + cluster
        map parquet), batch on disk. The incremental update's physical plan
        must reference ONLY those inputs — the old documents path must not
        appear anywhere in the plan."""
        from maplibre_tile_spec_spark.operators import dedup_incremental as DI

        _, old, new = split
        old_path = str(tmp_path / "old_docs.parquet")
        new_path = str(tmp_path / "new_batch.parquet")
        map_path = str(tmp_path / "cluster_map.parquet")
        old.write.mode("overwrite").parquet(old_path)
        new.write.mode("overwrite").parquet(new_path)
        table = DI.ensure_store_table(spark, "pytest_inc_scan")
        old_disk = spark.read.parquet(old_path)
        cmap = self._standing_state(spark, old_disk, table)
        cmap.write.mode("overwrite").parquet(map_path)
        cmap.unpersist()
        cmap_disk = spark.read.parquet(map_path)
        res = DI.lsh_dedup_incremental(
            spark.read.parquet(new_path), spark.table(table), cmap_disk
        )
        updated = DI.updated_assignment(cmap_disk, res)
        plan = updated._jdf.queryExecution().toString()
        assert "old_docs.parquet" not in plan, "incremental path rescans old documents"
        assert res.new_assign.count() > 0
        # remap application is a broadcast join over the corpus-sized map
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan

    def test_ensure_store_refuses_foreign_leftovers(self, spark, tmp_path):
        """The leftover-cleanup only ever deletes directories that look like
        Spark table output; a mistyped location holding foreign data must
        raise instead of being silently erased."""
        import os

        from maplibre_tile_spec_spark.operators import dedup_incremental as DI

        loc = str(tmp_path / "stores")
        os.makedirs(os.path.join(loc, "band_store_guard"))
        with open(os.path.join(loc, "band_store_guard", "precious.txt"), "w") as f:
            f.write("not a table file")
        with pytest.raises(ValueError, match="refusing to clear"):
            DI.ensure_store_table(spark, "guard", location=loc)
        # still present — nothing was deleted
        assert os.path.exists(os.path.join(loc, "band_store_guard", "precious.txt"))
        # a genuine leftover (only part-/_ files) is cleared as before
        leftover = os.path.join(loc, "band_store_guard2")
        os.makedirs(leftover)
        open(os.path.join(leftover, "_SUCCESS"), "w").close()
        open(os.path.join(leftover, "part-00000.parquet"), "w").close()
        DI.ensure_store_table(spark, "guard2", location=loc)
        assert not os.path.exists(leftover)

    def test_keep_canonical_union_semantics(self, spark, split):
        """incremental_keep_canonical over (standing canon table, batch)
        equals dedup_keep_canonical recomputed over old ∪ new."""
        from maplibre_tile_spec_spark.operators import dedup_incremental as DI

        d, old, new = split
        table = DI.ensure_store_table(spark, "pytest_inc_canon")
        cmap = self._standing_state(spark, old, table)
        old_pairs = dedup.lsh_candidate_pairs(old)
        canon = dedup.dedup_keep_canonical(old, old_pairs, id_col="doc_id")
        old_pairs.unpersist()
        res = DI.lsh_dedup_incremental(new, spark.table(table), cmap)
        got_df = DI.incremental_keep_canonical(new, res, canon, id_col="doc_id")
        got = {
            (r.cluster_id, r.doc_id, r.text, r.n_members) for r in got_df.collect()
        }
        full_pairs = dedup.lsh_candidate_pairs(d)
        want_df = dedup.dedup_keep_canonical(d, full_pairs, id_col="doc_id")
        want = {
            (r.cluster_id, r.doc_id, r.text, r.n_members) for r in want_df.collect()
        }
        full_pairs.unpersist()
        canon.unpersist()
        want_df.unpersist()
        cmap.unpersist()
        assert got == want


class TestStarComponents:
    """VERDICT r5 #6: large-star/small-star variant — identical labels to
    pointer jumping and the union-find oracle on every graph shape."""

    def test_star_matches_union_find_on_lsh_pairs(self, spark, docs):
        pairs = dedup.lsh_candidate_pairs(docs)
        edge_rows = [(r.doc_a, r.doc_b) for r in pairs.collect()]
        verts = {v for e in edge_rows for v in e}
        expect = _union_find(edge_rows, verts)
        got = {
            r.id: r.comp
            for r in dedup.connected_components(pairs, algorithm="star").collect()
        }
        assert got == expect
        pairs.unpersist()

    def test_star_chain_and_random_match_jump(self, spark):
        import random

        rng = random.Random(42)
        # adversarial chain (high diameter) + random sparse graph + self loops
        chain = [(i, i + 1) for i in range(300)]
        rand = [(rng.randrange(500, 900), rng.randrange(500, 900)) for _ in range(400)]
        edges = chain + rand + [(1000, 1000)]
        pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
        verts = {v for e in edges for v in e}
        expect = _union_find(edges, verts)
        star = {
            r.id: r.comp
            for r in dedup.connected_components(pairs, algorithm="star").collect()
        }
        jump = {r.id: r.comp for r in dedup.connected_components(pairs).collect()}
        assert star == expect
        assert jump == expect

    def test_star_converges_in_few_rounds_on_chain(self, spark):
        # O(log² n) structure-independence: a 400-diameter chain must
        # resolve well within 15 rounds (pointer jumping needs ~log2(400)=9
        # label rounds; star needs ~log rounds too but per-round cost is
        # structure-independent)
        edges = [(i, i + 1) for i in range(400)]
        pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
        got = {
            r.id: r.comp
            for r in dedup.connected_components(pairs, algorithm="star", max_iter=15).collect()
        }
        assert got == {i: 0 for i in range(401)}

    def test_unknown_algorithm_raises(self, spark):
        pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
        with pytest.raises(ValueError, match="algorithm"):
            dedup.connected_components(pairs, algorithm="bogus")


class TestStreamingIncrementalDedup:
    """The streaming twin drives the identical incremental kernel per
    micro-batch; the final standing cluster map must equal a one-shot batch
    cluster_assign over everything, and replayed batches must be no-ops."""

    def _drive(self, spark, src_dir, table, state, ckpt):
        from maplibre_tile_spec_spark.streaming import stream_ops

        schema = "doc_id long, text string"
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        q = stream_ops.streaming_dedup_incremental(stream, table, state, ckpt)
        q.processAllAvailable()
        q.stop()

    def test_stream_equals_batch_and_replay_noop(self, spark, sf_dir, tmp_path):
        import json
        import os

        from maplibre_tile_spec_spark.operators import dedup_incremental as DI

        d = (
            tables.load(spark, sf_dir, "documents")
            .select(F.col("doc_id").cast("long").alias("doc_id"), "text")
        )
        src = str(tmp_path / "src")
        d.repartition(3).write.parquet(src)
        table = DI.ensure_store_table(spark, "pytest_stream")
        DI.write_band_store(DI.minhash_band_table(d.limit(0)), table, n_buckets=8)
        state = str(tmp_path / "state")
        os.makedirs(state, exist_ok=True)
        self._drive(spark, src, table, state, str(tmp_path / "ck1"))

        man = json.load(open(os.path.join(state, "MANIFEST.json")))
        assert len(man["processed"]) == 3
        got = {
            (r.id, r.cluster_id)
            for r in spark.read.parquet(os.path.join(state, man["current_map"])).collect()
        }
        full_pairs = dedup.lsh_candidate_pairs(d)
        want = {
            (r.doc_id, r.cluster_id)
            for r in dedup.cluster_assign(d.select("doc_id"), full_pairs).collect()
        }
        full_pairs.unpersist()
        assert got == want

        # fresh checkpoint over the same files → every batch replays →
        # the manifest guard must skip them all and leave state untouched
        self._drive(spark, src, table, state, str(tmp_path / "ck2"))
        man2 = json.load(open(os.path.join(state, "MANIFEST.json")))
        assert man2 == man
        got2 = {
            (r.id, r.cluster_id)
            for r in spark.read.parquet(os.path.join(state, man2["current_map"])).collect()
        }
        assert got2 == want
        # per-batch assignment outputs exist for each micro-batch
        for b in man["processed"]:
            assert spark.read.parquet(os.path.join(state, f"assign_{b}")).count() > 0
