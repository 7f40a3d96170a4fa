"""Training-data operators over the driver testdata tables: text
analysis, dedup family, ANN — verified against DuckDB / brute force."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from geotreehealth_ray.pipelines import ann, dedup, text

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/embeddings.parquet")


def _duck(sql):
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return con.sql(sql).df()


def test_token_counts_match_duckdb(docs_ds):
    got = text.token_counts(docs_ds).to_pandas().sort_values("doc_id")
    exp = _duck(
        "SELECT doc_id, len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT AS n_tokens "
        "FROM documents ORDER BY doc_id"
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)


def test_quality_scores_match_duckdb(docs_ds):
    got = text.quality_scores(docs_ds).to_pandas().sort_values("doc_id")
    exp = _duck(
        """
        SELECT doc_id,
               len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT AS n_words,
               round(len(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                     / greatest(length(text), 1), 6) AS punct_ratio,
               round((length(trim(text)) - len(regexp_split_to_array(trim(text), '\\s+')) + 1)
                     / greatest(len(regexp_split_to_array(trim(text), '\\s+')), 1), 6)
                 AS mean_word_len_approx
        FROM documents ORDER BY doc_id
        """
    )
    np.testing.assert_array_equal(got["n_words"].to_numpy(), exp["n_words"].to_numpy())
    np.testing.assert_allclose(
        got["punct_ratio"].to_numpy(), exp["punct_ratio"].to_numpy(), atol=1e-9
    )


def test_content_hashes_match_duckdb(docs_ds):
    got = text.content_hashes(docs_ds).to_pandas().sort_values("doc_id")
    exp = _duck("SELECT doc_id, md5(text) AS content_hash FROM documents ORDER BY doc_id")
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)


def test_lang_id_heuristics(docs_ds):
    got = text.lang_id(docs_ds).to_pandas()
    assert set(got.columns) == {"doc_id", "lang_pred", "lang_conf"}
    assert len(got) == docs_ds.count()
    # crafted sanity checks on the kernel itself
    li = text.LangId()
    out = li(pd.DataFrame({"doc_id": [1, 2, 3],
                           "text": ["the cat and the dog in a house",
                                    "el perro y la casa de un que no se",
                                    "你好世界"]}))
    assert list(out["lang_pred"]) == ["en", "es", "zh"]


def test_lang_confusion_counts(docs_ds):
    got = text.lang_confusion(docs_ds).to_pandas()
    assert set(got.columns) == {"lang", "lang_pred", "n"}
    # cells sum to the full table: the matrix is a partition of all docs
    assert got["n"].sum() == docs_ds.count()
    # cross-check one cell against a driver-side recompute
    df = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    li = text.LangId()
    pred = li(df)["lang_pred"]
    exp = (df["lang"] == "en") & (pred == "en")
    cell = got[(got["lang"] == "en") & (got["lang_pred"] == "en")]
    assert int(cell["n"].iloc[0]) == int(exp.sum())


def test_exact_dedup_with_planted_dups(ray_session):
    import ray.data as rd

    df = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    # plant duplicates: copy first 10 texts onto new ids
    extra = df.head(10).copy()
    extra["doc_id"] = extra["doc_id"] + 100000
    full = pd.concat([df, extra], ignore_index=True)
    ds = rd.from_pandas(full)
    got = dedup.exact_dedup(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    exp = (
        full.groupby("text", sort=False)
        .agg(doc_id=("doc_id", "min"), n_dups=("doc_id", "size"))
        .reset_index(drop=True)
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp.astype({"n_dups": "int64"}))
    assert (got["n_dups"] > 1).sum() == 10


def test_minhash_precision_and_recall(ray_session):
    import ray.data as rd

    df = pq.read_table(f"{SF}/documents.parquet").to_pandas().head(120)
    # plant near-dups: light edits of existing texts
    edits = df.head(15).copy()
    edits["doc_id"] = edits["doc_id"] + 100000
    edits["text"] = edits["text"].str.replace("table", "tables", regex=False)
    full = pd.concat([df, edits], ignore_index=True)
    ds = rd.from_pandas(full)
    got = dedup.minhash_lsh_pairs(ds, k=5, num_perm=128, bands=32, threshold=0.6)
    gp = got.to_pandas()
    pairs = {(a, b) for a, b in zip(gp["doc_id_a"], gp["doc_id_b"])}
    # brute-force truth
    truth = set()
    texts = dict(zip(full["doc_id"], full["text"]))
    ids = sorted(texts)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if dedup.jaccard_of_texts(texts[ids[i]], texts[ids[j]], k=5) >= 0.6:
                truth.add((ids[i], ids[j]))
    assert pairs <= truth  # precision 1.0 (every pair verified exactly)
    planted = {(d, d + 100000) for d in df.head(15)["doc_id"]}
    planted_true = planted & truth
    assert planted_true and len(pairs & planted_true) >= 0.9 * len(planted_true)


def test_ngram_jaccard_exact_recall(ray_session):
    """Prefix-filtered all-pairs join: recall must be EXACTLY 1.0 (no
    LSH miss probability) and precision 1.0 (exact verify)."""
    import ray.data as rd

    df = pq.read_table(f"{SF}/documents.parquet").to_pandas().head(120)
    edits = df.head(15).copy()
    edits["doc_id"] = edits["doc_id"] + 100000
    edits["text"] = edits["text"].str.replace("the", "thee", regex=False)
    full = pd.concat([df, edits], ignore_index=True)
    got = dedup.ngram_jaccard_pairs(rd.from_pandas(full), n=3, threshold=0.4)
    gp = got.to_pandas()
    pairs = {(a, b) for a, b in zip(gp["doc_id_a"], gp["doc_id_b"])}
    # brute-force truth over word trigram sets
    texts = dict(zip(full["doc_id"], full["text"]))
    ids = sorted(texts)
    truth = set()
    for i in range(len(ids)):
        si = dedup._word_ngrams(texts[ids[i]] or "", 3)
        for j in range(i + 1, len(ids)):
            sj = dedup._word_ngrams(texts[ids[j]] or "", 3)
            if len(si) == 0 and len(sj) == 0:
                continue  # engine never pairs gram-less docs
            if dedup._jaccard_arrays(si, sj) >= 0.4:
                truth.add((ids[i], ids[j]))
    assert pairs == truth  # recall AND precision exactly 1.0
    assert truth  # non-vacuous: the planted edits must land above 0.4
    jac = dict(zip(zip(gp["doc_id_a"], gp["doc_id_b"]), gp["jaccard"]))
    for (a, b), v in jac.items():
        assert 0.4 <= v <= 1.0


def test_ngram_jaccard_prefix_prunes():
    """The emitted prefix is m - ceil(t*m) + 1 grams, not all m."""
    import math

    s = dedup._word_ngrams("a b c d e f g h i j k l", 3)  # 10 grams
    m = len(s)
    assert m == 10
    p = m - math.ceil(0.7 * m) + 1
    assert p == 4  # at t=0.7 only 4 of 10 grams are emitted


def test_simhash_finds_planted_dups(ray_session):
    import ray.data as rd

    df = pq.read_table(f"{SF}/documents.parquet").to_pandas().head(100)
    dup = df.head(8).copy()
    dup["doc_id"] = dup["doc_id"] + 100000  # identical text → hamming 0
    full = pd.concat([df, dup], ignore_index=True)
    got = dedup.simhash_pairs(rd.from_pandas(full), max_hamming=3).to_pandas()
    pairs = {(a, b) for a, b in zip(got["doc_id_a"], got["doc_id_b"])}
    for d in dup["doc_id"]:
        assert (d - 100000, d) in pairs
    assert (got["hamming"] <= 3).all()


def test_embedding_near_dup(emb_ds, ray_session):
    import ray.data as rd

    df = pq.read_table(f"{SF}/embeddings.parquet").to_pandas().head(120)
    twin = df.head(6).copy()
    twin["vec_id"] = twin["vec_id"] + 100000  # identical vectors
    full = pd.concat([df, twin], ignore_index=True)
    got = dedup.embedding_near_dup(rd.from_pandas(full), threshold=0.999).to_pandas()
    pairs = {(a, b) for a, b in zip(got["vec_id_a"], got["vec_id_b"])}
    for v in twin["vec_id"]:
        assert (v - 100000, v) in pairs
    assert (got["cosine"] >= 0.999).all()


def test_embedding_near_dup_noisy_recall(ray_session):
    """Multi-table LSH recall: NOISY near-dups at cosine ≈0.97 (not
    identical — a single 12-plane table only catches ~32% of these) plus
    exhaustive-precision check against brute force."""
    import ray.data as rd

    df = pq.read_table(f"{SF}/embeddings.parquet").to_pandas().head(100)
    base = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    rng = np.random.default_rng(3)
    noisy = base[:20] + rng.normal(scale=0.08, size=base[:20].shape) * np.abs(
        base[:20]
    ).mean()
    twin = df.head(20).copy()
    twin["vec_id"] = twin["vec_id"] + 100000
    twin["embedding"] = list(noisy)
    full = pd.concat([df, twin], ignore_index=True)

    threshold = 0.9
    got = dedup.embedding_near_dup(
        rd.from_pandas(full), threshold=threshold
    ).to_pandas()
    pairs = {(a, b) for a, b in zip(got["vec_id_a"], got["vec_id_b"])}

    vecs = np.stack(full["embedding"].to_numpy()).astype(np.float64)
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = unit @ unit.T
    ids = full["vec_id"].to_numpy()
    true_pairs = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if sims[i, j] >= threshold:
                a, b = sorted((int(ids[i]), int(ids[j])))
                true_pairs.add((a, b))
    assert len(true_pairs) >= 15  # planting produced enough positives
    # precision 1.0: every emitted pair is a true pair with exact cosine
    assert pairs <= true_pairs
    assert (got["cosine"] >= threshold).all()
    # multi-table recall on this seed-fixed corpus
    assert len(pairs) / len(true_pairs) >= 0.85


def test_ann_bruteforce_matches_numpy(emb_ds):
    df = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    vecs = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    queries = vecs[:3]
    got = ann.ann_bruteforce_topk(emb_ds, queries, k=5).to_pandas()
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qu = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    sims = unit @ qu.T
    ids = df["vec_id"].to_numpy()
    for qi in range(3):
        g = got[got["query_id"] == qi].sort_values("rank")
        exp_idx = np.lexsort((ids, -sims[:, qi]))[:5]
        assert list(g["vec_id"]) == list(ids[exp_idx])


def test_ann_ivf_recall(emb_ds):
    df = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    vecs = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    queries = vecs[:5]
    exact = ann.ann_bruteforce_topk(emb_ds, queries, k=10).to_pandas()
    approx = ann.ann_ivf_topk(emb_ds, queries, k=10, n_centroids=8, nprobe=4).to_pandas()
    recalls = []
    for qi in range(5):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.6  # nprobe=4 of 8 buckets


def test_phash_near_dup_blocking_is_exact(ray_session):
    """Pigeonhole blocking == brute-force popcount at the threshold:
    recall AND precision 1.0 on structured hashes (planted clusters at
    Hamming 1-6 plus random far hashes)."""
    import ray.data as rd

    rng = np.random.default_rng(7)
    hashes, planted = [], []
    for c in range(30):
        base = np.uint64(rng.integers(0, 2**63, dtype=np.int64))
        hashes.append(base)
        flipped = base
        for j in range(1 + c % 3):
            flipped ^= np.uint64(1) << np.uint64(rng.integers(0, 64))
            hashes.append(flipped)
    hashes.extend(np.uint64(v) for v in
                  rng.integers(0, 2**63, size=200, dtype=np.int64))
    arr = np.array(hashes, np.uint64)
    ids = np.arange(len(arr), dtype=np.int64)
    ds = rd.from_pandas(pd.DataFrame(
        {"image_id": ids, "phash": arr.view(np.int64)}))
    got = dedup.phash_near_dup(ds, max_hamming=7).to_pandas()
    got_pairs = {(a, b) for a, b in zip(got["image_id_a"], got["image_id_b"])}
    ham = dedup._popcount64(arr[:, None] ^ arr[None, :])
    ia, ib = np.nonzero(ham <= 7)
    want = {(int(i), int(j)) for i, j in zip(ia, ib) if i < j}
    assert got_pairs == want and len(want) > 0
    for _, r in got.iterrows():
        assert r["hamming"] == ham[r["image_id_a"], r["image_id_b"]]


def test_phash_near_dup_real_images(ray_session):
    """End-to-end on the image+caption table shape: re-rendered (noisy)
    copies of an image land within Hamming 7 of the original's
    average_hash; unrelated images stay far."""
    import ray.data as rd

    from geotreehealth_ray.functions import codec

    rng = np.random.default_rng(11)
    rows = {"image_id": [], "phash": []}
    for i in range(40):
        img = rng.integers(0, 256, size=(64, 64, 3)).astype(np.uint8)
        rows["image_id"].append(f"img-{i:03d}")
        rows["phash"].append(codec.average_hash(img))
        if i < 6:  # planted near-dup: tiny brightness jitter, re-hashed
            noisy = np.clip(
                img.astype(np.int16) + rng.integers(-1, 2, img.shape), 0, 255
            ).astype(np.uint8)
            rows["image_id"].append(f"img-{i:03d}-dup")
            rows["phash"].append(codec.average_hash(noisy))
    ds = rd.from_pandas(pd.DataFrame(rows))
    got = dedup.phash_near_dup(ds, max_hamming=7).to_pandas()
    pairs = {(a, b) for a, b in zip(got["image_id_a"], got["image_id_b"])}
    for i in range(6):
        assert (f"img-{i:03d}", f"img-{i:03d}-dup") in pairs
    assert (got["hamming"] <= 7).all()


def test_connected_components_dedup_transitive(ray_session):
    import ray.data as rd

    from geotreehealth_ray.pipelines.dedup import connected_components_dedup

    # chain 1-2, 2-3 plus an isolated pair 7-5 and singletons 4, 6
    docs = rd.from_pandas(pd.DataFrame({"doc_id": [1, 2, 3, 4, 5, 6, 7]}))
    pairs = rd.from_pandas(
        pd.DataFrame({"doc_id_a": [1, 2, 5], "doc_id_b": [2, 3, 7]})
    ).repartition(3)
    out = (
        connected_components_dedup(docs, pairs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["rep_id"].tolist() == [1, 1, 1, 4, 5, 6, 5]


def test_connected_components_distributed_matches_driver(ray_session):
    """Dup-heavy planted corpus through the min-label fallback path:
    byte-identical cluster output vs the driver union-find, including
    a long chain (pointer doubling must collapse it, not time out) and
    ids untouched by any edge."""
    import ray.data as rd

    from geotreehealth_ray.pipelines.dedup import connected_components_dedup

    rng = np.random.default_rng(7)
    n = 400
    docs = rd.from_pandas(pd.DataFrame({"doc_id": np.arange(n)}))
    # a 60-node path (worst-case diameter), two dense blobs, random
    # extra edges → ~45% of docs are in some dup cluster
    chain = [(i, i + 1) for i in range(100, 160)]
    blob1 = [(200, j) for j in range(201, 220)]
    blob2 = [(300, j) for j in range(301, 320)]
    extra = [(int(a), int(b)) for a, b in
             rng.integers(0, 80, size=(40, 2)) if a != b]
    edges = chain + blob1 + blob2 + extra
    pairs = rd.from_pandas(pd.DataFrame(
        {"doc_id_a": [a for a, _ in edges],
         "doc_id_b": [b for _, b in edges]})).repartition(5)

    drv = connected_components_dedup(docs, pairs, mode="driver") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    dist = connected_components_dedup(docs, pairs, mode="distributed") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert dist["rep_id"].dtype == drv["rep_id"].dtype
    assert dist.equals(drv)
    # auto mode with a tiny budget must route to the distributed path
    auto = connected_components_dedup(docs, pairs, mode="auto",
                                      edge_budget=10) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert auto.equals(drv)
    # forced driver mode past the budget fails loudly, not OOM
    import pytest as _pytest
    with _pytest.raises(ValueError, match="edge_budget"):
        connected_components_dedup(docs, pairs, mode="driver",
                                   edge_budget=10).to_pandas()


def test_connected_components_distributed_string_ids(ray_session):
    import ray.data as rd

    from geotreehealth_ray.pipelines.dedup import connected_components_dedup

    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": [f"d{i:02d}" for i in range(8)]}))
    pairs = rd.from_pandas(pd.DataFrame(
        {"doc_id_a": ["d01", "d02", "d06"],
         "doc_id_b": ["d02", "d03", "d05"]}))
    out = connected_components_dedup(docs, pairs, mode="distributed") \
        .to_pandas().sort_values("doc_id")
    assert out["rep_id"].tolist() == [
        "d00", "d01", "d01", "d01", "d04", "d05", "d05", "d07"]


def test_verify_paths_identical(ray_session, docs_ds):
    """The broadcast verify (small corpus) and the partitioned
    text-join verify must emit identical pairs — the dispatch in
    minhash/jaccard is a pure performance fork."""
    import ray.data as rd

    band_rows = docs_ds.select_columns(["doc_id", "text"])
    # build candidates once via the public API's internals: reuse
    # minhash pairs as the candidate set for both verify strategies
    got = dedup.minhash_lsh_pairs(docs_ds, threshold=0.5).to_pandas()

    # force the partitioned path by erasing file lineage (from_pandas)
    mat = docs_ds.to_pandas()
    ds_nofile = rd.from_pandas(mat)
    got2 = dedup.minhash_lsh_pairs(ds_nofile, threshold=0.5).to_pandas()

    key = ["doc_id_a", "doc_id_b", "jaccard"]
    a = got[key].sort_values(key).reset_index(drop=True)
    b = got2[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
