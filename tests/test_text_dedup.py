"""Text analysis + dedup family + similarity search, each checked against
its DuckDB mirror where one exists (the same SQL used by __ray_entry__)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from etl_pipeline_rdf_star_ray.functions import text as tx
from etl_pipeline_rdf_star_ray.pipelines import dedup, similarity

SF = "/root/testdata/sf0.001"


def _docs():
    return pq.read_table(f"{SF}/documents.parquet")


def _docs_ds():
    return rd.read_parquet(f"{SF}/documents.parquet")


def _embs_ds():
    return rd.read_parquet(f"{SF}/embeddings.parquet")


def _con():
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    return con


def test_token_count_matches_sql():
    t = pa.table({"text": ["a b  c", "  x ", "", "one", None]})
    got = tx.token_count(t.column("text")).to_pylist()
    assert got == [3, 1, 0, 1, None]
    con = duckdb.connect()
    con.register("t", t)
    sql = con.sql(
        "SELECT CASE WHEN trim(text)='' THEN 0 "
        "ELSE len(string_split_regex(trim(text), '\\s+')) END FROM t"
    ).fetchall()
    assert [r[0] for r in sql] == [3, 1, 0, 1, None]


def test_quality_features_match_sql():
    ds = _docs_ds().map_batches(tx.quality_features, batch_format="pyarrow")
    got = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = _con()
    expect = con.sql(
        """
        SELECT doc_id,
          CASE WHEN trim(text)='' THEN 0
               ELSE len(string_split_regex(trim(text),'\\s+')) END::BIGINT AS n_tokens,
          length(text)::BIGINT AS n_chars,
          floor(length(regexp_replace(text,'\\s','','g'))::DOUBLE
                / greatest(CASE WHEN trim(text)='' THEN 0
                   ELSE len(string_split_regex(trim(text),'\\s+')) END, 1)
                * 10000)/10000 AS mean_token_len,
          floor(len(regexp_extract_all(lower(text),
            '\\b(the|and|is|of|to|a|in|that)\\b'))::DOUBLE
                / greatest(CASE WHEN trim(text)='' THEN 0
                   ELSE len(string_split_regex(trim(text),'\\s+')) END, 1)
                * 10000)/10000 AS stop_ratio
        FROM documents ORDER BY doc_id
        """
    ).df()
    assert (got["n_tokens"].values == expect["n_tokens"].values).all()
    assert (got["n_chars"].values == expect["n_chars"].values).all()
    assert np.array_equal(got["mean_token_len"].values, expect["mean_token_len"].values)
    assert np.array_equal(got["stop_ratio"].values, expect["stop_ratio"].values)


def test_langid_deterministic():
    t = pa.table(
        {
            "text": [
                "the cat and the hat is in that house",
                "der hund und die katze ist nicht da",
                "le chat et la maison est une belle",
                "你好世界 漢字 漢字",
                "zzz qqq www",
            ]
        }
    )
    out = tx.langid(t)["lang_pred"].to_pylist()
    assert out == ["en", "de", "fr", "zh", "und"]


def test_fingerprint_matches_duckdb_md5():
    ds = _docs_ds().map_batches(tx.fingerprint_md5, batch_format="pyarrow")
    got = (
        ds.to_pandas()[["doc_id", "fingerprint"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = _con()
    expect = con.sql(
        "SELECT doc_id, md5(text) fingerprint FROM documents ORDER BY doc_id"
    ).df()
    assert (got["fingerprint"].values == expect["fingerprint"].values).all()


def test_content_hash64_and_rolling_fingerprint_deterministic():
    t = _docs().select(["doc_id", "text"])
    a = tx.content_hash64(t)["h64"].to_pylist()
    b = tx.content_hash64(t)["h64"].to_pylist()
    assert a == b
    r1 = tx.rolling_fingerprint(t.slice(0, 20))["winnow64"].to_pylist()
    r2 = tx.rolling_fingerprint(t.slice(0, 20))["winnow64"].to_pylist()
    assert r1 == r2 and len(set(r1)) > 1


def test_dedup_exact_matches_sql():
    got = dedup.dedup_exact(_docs_ds()).to_pandas()
    con = _con()
    expect = con.sql(
        """
        SELECT * FROM documents QUALIFY
          row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
        """
    ).df()
    assert len(got) == len(expect)
    assert set(got["doc_id"]) == set(expect["doc_id"])


def test_dedup_exact_removes_duplicates():
    t = pa.table({"doc_id": [3, 1, 2, 4], "text": ["x", "x", "y", "y"]})
    got = dedup.dedup_exact(rd.from_arrow(t)).to_pandas()
    assert sorted(got["doc_id"]) == [1, 2]


def test_minhash_lsh_finds_near_dups():
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "the quick brown fox jumps over the lazy dog again and again today",
        "completely different content about ray data pipelines at scale",
        "another unrelated document mentioning arrow and parquet files",
    ]
    ds = rd.from_arrow(pa.table({"doc_id": [1, 2, 3, 4], "text": texts}))
    pairs = dedup.dedup_minhash_lsh(
        ds, config=dedup.MinHashConfig(jaccard_threshold=0.4)
    ).to_pandas()
    assert {(a, b) for a, b in zip(pairs.id_a, pairs.id_b)} == {(1, 2)}
    assert (pairs.jaccard >= 0.4).all()


def test_minhash_signature_approximates_jaccard():
    mh = dedup.MinHasher(dedup.MinHashConfig(num_perm=128))
    a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    b = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 xx yy"
    est = (mh.signature(a) == mh.signature(b)).mean()
    true = dedup._true_jaccard(a, b, 3)
    assert abs(est - true) < 0.25


def test_simhash_near_dups():
    # simhash with unit weights needs real-length docs: ~180 tokens with one
    # occurrence changed lands within hamming<=3; short docs are out of scope
    base = " ".join(f"tok{i}" for i in range(60))
    d1 = (base + " ") * 3
    d2 = d1.replace("tok7 ", "tok7x ", 1)
    d3 = " ".join(f"other{i}" for i in range(60))
    ds = rd.from_arrow(pa.table({"doc_id": [1, 2, 3], "text": [d1, d2, d3]}))
    pairs = dedup.dedup_simhash(ds).to_pandas()
    assert (1, 2) in {(a, b) for a, b in zip(pairs.id_a, pairs.id_b)}
    assert 3 not in set(pairs.id_a) | set(pairs.id_b)


def test_ngram_jaccard_matches_sql():
    got = (
        dedup.ngram_jaccard_pairs(_docs_ds(), threshold=0.5)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    con = _con()
    expect = con.sql(
        """
        WITH toks AS (
          SELECT doc_id, source,
                 list_distinct(array_filter(
                   string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS t
          FROM documents)
        SELECT a.doc_id id_a, b.doc_id id_b,
               floor(len(list_intersect(a.t, b.t))::DOUBLE
                     / (len(a.t) + len(b.t) - len(list_intersect(a.t, b.t)))
                     * 1000000)/1000000 AS jaccard
        FROM toks a JOIN toks b
          ON a.source = b.source AND a.doc_id < b.doc_id
        WHERE len(list_intersect(a.t, b.t))::DOUBLE
              / (len(a.t) + len(b.t) - len(list_intersect(a.t, b.t))) >= 0.5
        ORDER BY id_a, id_b
        """
    ).df()
    assert len(got) == len(expect)
    if len(got):
        assert (got["id_a"].values == expect["id_a"].values).all()
        assert np.array_equal(got["jaccard"].values, expect["jaccard"].values)


def test_cosine_topk_matches_sql():
    embs = pq.read_table(f"{SF}/embeddings.parquet")
    q = np.array(embs.column("embedding")[0].as_py())
    got = similarity.cosine_topk(_embs_ds(), q, k=5).to_pandas()
    con = _con()
    expect = con.sql(
        """
        WITH q AS (SELECT embedding e FROM embeddings ORDER BY vec_id LIMIT 1)
        SELECT vec_id,
               floor(list_cosine_similarity(embedding, (SELECT e FROM q))
                     * 10000)/10000 AS cosine
        FROM embeddings ORDER BY cosine DESC, vec_id LIMIT 5
        """
    ).df()
    assert got["vec_id"].tolist() == expect["vec_id"].tolist()
    assert np.allclose(got["cosine"], expect["cosine"], atol=2e-4)


def test_cosine_topk_lsh_probe_contains_query_vec():
    embs = pq.read_table(f"{SF}/embeddings.parquet")
    q = np.array(embs.column("embedding")[0].as_py())
    got = similarity.cosine_topk_lsh(_embs_ds(), q, k=5).to_pandas()
    # the query's own vector lives in its own bucket → must surface first
    assert got.iloc[0]["vec_id"] == 0
    assert got.iloc[0]["cosine"] >= 0.9999


def test_multimodal_plumbing():
    from etl_pipeline_rdf_star_ray.pipelines import multimodal as mm

    media = mm.to_media_dataset(_docs_ds())
    decoded = mm.decode_media(media, batch_size=64).to_pandas()
    assert len(decoded) == 500
    assert {"media_id", "kind", "media_meta", "width", "height", "feature"} <= set(
        decoded.columns
    )
    assert "payload" not in decoded.columns
    assert decoded["width"].between(16, 80).all()
    assert all(len(f) == mm.DecodeStage.FEATURE_DIM for f in decoded["feature"])
    # deterministic across runs
    again = mm.decode_media(mm.to_media_dataset(_docs_ds()), batch_size=64).to_pandas()
    a = decoded.sort_values("media_id")["width"].tolist()
    b = again.sort_values("media_id")["width"].tolist()
    assert a == b


def test_require_codecs_gate():
    import pytest

    from etl_pipeline_rdf_star_ray.pipelines import multimodal as mm

    if not mm.have_image_codec():
        with pytest.raises(NotImplementedError):
            mm.require_codecs()


def test_resize_and_frame_sample_stubs():
    import pytest

    from etl_pipeline_rdf_star_ray.pipelines import multimodal as mm

    media = mm.to_media_dataset(_docs_ds().limit(50), kind="video")
    if not mm.have_image_codec():
        # non-PNG payload without PIL: strict mode raises at decode time
        with pytest.raises(NotImplementedError):
            mm.ResizeStage()(
                pa.table(
                    {
                        "media_id": pa.array([1], pa.int64()),
                        "payload": pa.array([b"not-a-png"], pa.binary()),
                    }
                )
            )
    resized = media.map_batches(
        mm.ResizeStage, fn_constructor_kwargs={"allow_fake": True},
        batch_format="pyarrow", batch_size=16, concurrency=2,
    ).to_pandas()
    assert (resized["width"] == 224).all() and (resized["height"] == 224).all()
    frames = media.map_batches(
        mm.FrameSampleStage, fn_constructor_kwargs={"allow_fake": True},
        batch_format="pyarrow", batch_size=16, concurrency=2,
    ).to_pandas()
    assert len(frames) >= 50 and "frame_idx" in frames.columns
    # deterministic fan-out
    again = media.map_batches(
        mm.FrameSampleStage, fn_constructor_kwargs={"allow_fake": True},
        batch_format="pyarrow", batch_size=16, concurrency=2,
    ).to_pandas()
    assert len(frames) == len(again)


def test_frame_sample_real_png_stream():
    """REAL frame sampling: a concatenated-PNG 'video' container is split by
    chunk walking, every stride-th frame comes back as its own row with the
    frame's exact bytes and IHDR dims — no codec library involved."""
    import numpy as np

    from etl_pipeline_rdf_star_ray.functions import png as p
    from etl_pipeline_rdf_star_ray.pipelines import multimodal as mm

    rng = np.random.default_rng(3)
    frames = [
        rng.integers(0, 255, size=(8 + i, 6, 3), dtype=np.uint8).astype(np.uint8)
        for i in range(7)
    ]
    container = b"".join(p.encode_png(f) for f in frames)
    assert len(p.split_png_stream(container)) == 7

    batch = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "payload": pa.array([container], pa.binary()),
        }
    )
    # strict mode (allow_fake=False): PNG streams are a real path, no raise
    out = mm.FrameSampleStage(stride=3)(batch)
    assert out.column("frame_idx").to_pylist() == [0, 3, 6]
    assert out.column("width").to_pylist() == [6, 6, 6]
    assert out.column("height").to_pylist() == [8, 11, 14]
    # sampled payloads are the exact original frame bytes, decodable
    for row, fi in enumerate([0, 3, 6]):
        got = out.column("payload")[row].as_py()
        assert got == p.encode_png(frames[fi])
        assert np.array_equal(p.decode_png(got), frames[fi])


def test_cosine_topk_ivf_contains_query():
    import pyarrow.parquet as pq

    embs = pq.read_table(f"{SF}/embeddings.parquet")
    q = np.array(embs.column("embedding")[0].as_py())
    got = similarity.cosine_topk_ivf(_embs_ds(), q, k=5, nprobe=4).to_pandas()
    assert got.iloc[0]["vec_id"] == 0 and got.iloc[0]["cosine"] >= 0.9999
    # full probe degenerates to brute force
    full = similarity.cosine_topk_ivf(
        _embs_ds(), q, k=5, num_centroids=4, nprobe=4
    ).to_pandas()
    brute = similarity.cosine_topk(_embs_ds(), q, k=5).to_pandas()
    assert full["vec_id"].tolist() == brute["vec_id"].tolist()


# ---------------------------------------------------------------------------
# property oracles for the approx near-dup ops (round-1 verdict item 10):
# zero false positives by recomputation, recall bounded against the exact
# all-pairs ground truth. Referenced from COVERAGE.md.
# ---------------------------------------------------------------------------


def _exact_shingle_pairs(threshold: float, k: int = 3) -> dict[tuple, float]:
    """Brute-force ground truth: word-shingle Jaccard over ALL doc pairs."""
    docs = _docs().to_pandas()
    ids = docs["doc_id"].to_numpy()
    sh = [dedup._word_shingles(t or "", k) for t in docs["text"]]
    out = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            sa, sb = sh[i], sh[j]
            if len(sa) == 0 or len(sb) == 0:
                continue
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            jac = inter / (len(sa) + len(sb) - inter)
            if jac >= threshold:
                a, b = sorted((int(ids[i]), int(ids[j])))
                out[(a, b)] = jac
    return out


def test_minhash_lsh_zero_false_positives_and_recall():
    cfg = dedup.MinHashConfig()
    got = dedup.dedup_minhash_lsh(_docs_ds(), config=cfg).to_pandas()
    emitted = {
        (int(min(a, b)), int(max(a, b))): j
        for a, b, j in zip(got["id_a"], got["id_b"], got["jaccard"])
    }
    # zero false positives: every emitted pair's true Jaccard clears the
    # threshold (recomputed independently of the pipeline)
    truth = _exact_shingle_pairs(cfg.jaccard_threshold, cfg.shingle_k)
    for pair, jac in emitted.items():
        assert pair in truth, f"false positive pair {pair}"
        assert abs(truth[pair] - jac) < 1e-9
    # recall: at j >= 0.7 the 16-band/4-row LSH detection probability is
    # 1-(1-j^4)^16 >= 0.986 per pair — demand >= 0.9 over the corpus
    strong = {p for p, j in truth.items() if j >= 0.7}
    if strong:
        recall = len(strong & set(emitted)) / len(strong)
        assert recall >= 0.9, f"recall {recall} over {len(strong)} strong pairs"


def test_simhash_blocking_is_exhaustive():
    """Pigeonhole property: with 4 blocks of 16 bits, any pair within
    Hamming <= 3 shares at least one block — the blocked pipeline must emit
    EXACTLY the brute-force all-pairs result."""
    cfg = dedup.SimHashConfig()
    got = dedup.dedup_simhash(_docs_ds(), config=cfg).to_pandas()
    emitted = {
        (int(min(a, b)), int(max(a, b))): int(h)
        for a, b, h in zip(got["id_a"], got["id_b"], got["hamming"])
    }
    signed = dedup.simhash_batch(_docs().select(["doc_id", "text"])).to_pandas()
    ids = signed["doc_id"].to_numpy()
    hs = signed["simhash"].to_numpy().astype(np.uint64)
    ii, jj = np.triu_indices(len(ids), k=1)
    x = hs[ii] ^ hs[jj]
    ham = dedup._POPCOUNT[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1)
    keep = ham <= cfg.max_hamming
    truth = {
        (int(min(a, b)), int(max(a, b))): int(h)
        for a, b, h in zip(ids[ii[keep]], ids[jj[keep]], ham[keep])
    }
    assert emitted == truth


def test_minhash_verify_rounds_match_single_broadcast():
    """A tiny text budget must force multi-round verification (id-range
    pair rounds, one filtered scan + bounded broadcast each) with output
    identical to the single-broadcast fast path (round-2 verdict item 6)."""
    cfg = dedup.MinHashConfig()
    one = dedup.dedup_minhash_lsh(_docs_ds(), config=cfg).to_pandas()
    assert len(one) > 1, "fixture must produce several candidate pairs"
    # ~50 bytes forces a new round for nearly every pair
    multi = dedup.dedup_minhash_lsh(
        _docs_ds(), config=cfg, verify_text_budget_bytes=50
    ).to_pandas()
    key = ["id_a", "id_b"]
    one_s = one.sort_values(key).reset_index(drop=True)
    multi_s = multi.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(one_s, multi_s)


# ---------------------------------------------------------------------------
# real PNG decode path (pure-Python codec, round-2 verdict item 3)
# ---------------------------------------------------------------------------


def _random_png(rng, w, h, ch):
    from etl_pipeline_rdf_star_ray.functions import png

    arr = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint16).astype(np.uint8)
    return arr, png.encode_png(arr)


def test_png_roundtrip_all_color_types():
    from etl_pipeline_rdf_star_ray.functions import png

    rng = np.random.default_rng(7)
    for ch in (1, 2, 3, 4):
        arr, data = _random_png(rng, 13, 9, ch)
        assert png.is_png(data)
        back = png.decode_png(data)
        np.testing.assert_array_equal(back, arr)


def test_png_decoder_handles_all_filters():
    """zlib-written streams use filter 0; exercise Sub/Up/Average/Paeth by
    hand-building the filtered scanlines."""
    import struct
    import zlib

    from etl_pipeline_rdf_star_ray.functions import png

    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint16).astype(np.uint8)
    h, w, ch = arr.shape
    stride = w * ch
    flat = arr.reshape(h, stride).astype(np.int32)
    lines = []
    for y, f in enumerate([0, 1, 2, 3, 4]):
        prev = flat[y - 1] if y else np.zeros(stride, np.int32)
        cur = flat[y]
        filt = np.zeros(stride, np.int32)
        for x in range(stride):
            a = cur[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if f == 0:
                filt[x] = cur[x]
            elif f == 1:
                filt[x] = cur[x] - a
            elif f == 2:
                filt[x] = cur[x] - b
            elif f == 3:
                filt[x] = cur[x] - ((a + b) >> 1)
            else:
                p = a + b - c
                pred = a if abs(p - a) <= abs(p - b) and abs(p - a) <= abs(p - c) \
                    else (b if abs(p - b) <= abs(p - c) else c)
                filt[x] = cur[x] - pred
        lines.append(bytes([f]) + (filt & 0xFF).astype(np.uint8).tobytes())

    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    data = (
        png.PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(png.decode_png(data), arr)


def test_decode_stage_real_png_path():
    """PNG payloads must take the REAL decode path (actual dims, area-mean
    feature), while non-PNG payloads keep the sha256 fake — through the
    actual actor-pool map_batches plumbing."""
    from etl_pipeline_rdf_star_ray.functions import png
    from etl_pipeline_rdf_star_ray.pipelines import multimodal as mm

    rng = np.random.default_rng(3)
    arrs, payloads = [], []
    for i, (w, h) in enumerate([(7, 5), (32, 16), (3, 3)]):
        arr, data = _random_png(rng, w, h, 3)
        arrs.append(arr)
        payloads.append(data)
    payloads.append(b"plain text, not an image")
    media = rd.from_arrow(
        pa.table(
            {
                "media_id": pa.array([0, 1, 2, 3], pa.int64()),
                "kind": ["image"] * 4,
                "payload": pa.array(payloads, pa.binary()),
            }
        )
    )
    got = (
        mm.decode_media(media, batch_size=2)
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    assert list(got["width"][:3]) == [7, 32, 3]
    assert list(got["height"][:3]) == [5, 16, 3]
    np.testing.assert_allclose(
        np.array(list(got["feature"][0])), png.grayscale_feature(arrs[0]),
        rtol=1e-6,
    )
    # the non-PNG row stays on the deterministic fake (oracle-compatible)
    import hashlib as hl

    digest = hl.sha256(payloads[3]).digest()
    assert got["width"][3] == 16 + digest[0] % 64
    assert got["height"][3] == 16 + digest[1] % 64


def test_resize_stage_real_png_path():
    from etl_pipeline_rdf_star_ray.functions import png
    from etl_pipeline_rdf_star_ray.pipelines import multimodal as mm

    rng = np.random.default_rng(5)
    arr, data = _random_png(rng, 10, 6, 3)
    batch = pa.table(
        {
            "media_id": pa.array([0], pa.int64()),
            "payload": pa.array([data], pa.binary()),
        }
    )
    out = mm.ResizeStage(4, 4)(batch)
    resized = png.decode_png(out.column("payload")[0].as_py())
    assert resized.shape == (4, 4, 3)
    np.testing.assert_array_equal(resized, png.resize_nearest(arr, 4, 4))
    assert out.column("width")[0].as_py() == 4


def _pairs_norm(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def test_embedding_neardup_blockpairs_matches_broadcast(ray_session):
    """The distributed block-pair scale path is EXACT: identical pairs and
    floored cosines as the broadcast-matmul path, across multiple blocks."""
    broadcast = dedup.embedding_neardup(
        _embs_ds(), threshold=0.35, mode="broadcast"
    ).to_pandas()
    blockpairs = dedup.embedding_neardup(
        _embs_ds(), threshold=0.35, mode="blockpairs",
        # tiny budget: forces many blocks, exercising self + cross tasks
        broadcast_budget_bytes=8 * 64 * 50 * 8,
    ).to_pandas()
    assert len(broadcast) > 0
    pd.testing.assert_frame_equal(
        _pairs_norm(broadcast), _pairs_norm(blockpairs)
    )


def test_embedding_neardup_auto_switches_on_budget(ray_session):
    """mode='auto' with a budget smaller than the corpus matrix must route
    through the block-pair path (no driver to_pandas) and still match."""
    # corpus matrix ≈ rows·64·8 bytes; a budget just under it forces the
    # auto switch while keeping the block fan-out small for the test
    small_budget = dedup.embedding_neardup(
        _embs_ds(), threshold=0.35, broadcast_budget_bytes=200_000
    ).to_pandas()
    default = dedup.embedding_neardup(_embs_ds(), threshold=0.35).to_pandas()
    pd.testing.assert_frame_equal(
        _pairs_norm(small_budget), _pairs_norm(default)
    )


# ---------------------------------------------------------------------------
# baseline JPEG codec (round 4): real non-PNG decode path
# ---------------------------------------------------------------------------


def _gradient_img(w: int, h: int, c: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    base = xx * 255 / max(w - 1, 1) * 0.5 + yy * 255 / max(h - 1, 1) * 0.5
    return np.stack(
        [(base + i * 20) % 256 for i in range(c)], axis=2
    ).astype(np.uint8)


def test_jpeg_roundtrip_shapes_and_subsampling():
    from etl_pipeline_rdf_star_ray.functions import jpeg

    for w, h, c in [(16, 16, 3), (24, 40, 3), (17, 23, 3), (8, 8, 1), (9, 33, 1)]:
        img = _gradient_img(w, h, c)
        for sub in ["444", "420"] if c == 3 else ["444"]:
            enc = jpeg.encode_jpeg(img, quality=95, subsample=sub)
            assert jpeg.is_jpeg(enc)
            assert jpeg.jpeg_dims(enc) == (w, h)
            dec = jpeg.decode_jpeg(enc)
            assert dec.shape == (h, w, c)
            err = np.abs(dec.astype(int) - img.astype(int)).mean()
            assert err < (3 if sub == "444" else 30), (w, h, c, sub, err)


def test_jpeg_noise_stress_and_low_quality():
    """Noise hits every entropy path (ZRL, long AC runs, big categories);
    low quality hits heavy quantization. Decode must stay in-bounds and
    dimensionally exact."""
    from etl_pipeline_rdf_star_ray.functions import jpeg

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    for q in (10, 50, 95):
        dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=q))
        assert dec.shape == (32, 32, 3) and dec.dtype == np.uint8


def test_jpeg_rejections_are_explicit():
    import struct

    import pytest as _pytest

    from etl_pipeline_rdf_star_ray.functions import jpeg

    assert not jpeg.is_jpeg(b"plain text")
    with _pytest.raises(jpeg.JpegError, match="signature"):
        jpeg.decode_jpeg(b"not a jpeg")
    # progressive (SOF2) is rejected by name, not mis-decoded
    enc = bytearray(jpeg.encode_jpeg(_gradient_img(8, 8, 1)))
    sof = enc.find(b"\xff\xc0")
    enc[sof + 1] = 0xC2
    with _pytest.raises(jpeg.JpegError, match="baseline"):
        jpeg.decode_jpeg(bytes(enc))
    # 16-bit quant tables rejected
    bad = bytearray(jpeg.encode_jpeg(_gradient_img(8, 8, 1)))
    dqt = bad.find(b"\xff\xdb")
    bad[dqt + 4] = 0x10  # pq=1
    with _pytest.raises(jpeg.JpegError, match="quantization"):
        jpeg.decode_jpeg(bytes(bad))
    # struct import used for parity with module-level segment builders
    assert struct.pack(">H", 1) == b"\x00\x01"


def test_decode_stage_real_jpeg_path():
    """JPEG payloads take the REAL decode path through the actor-pool
    plumbing: actual dims and a feature computed from decoded pixels —
    the fake is now reserved for audio/exotic payloads."""
    from etl_pipeline_rdf_star_ray.functions import jpeg, png
    from etl_pipeline_rdf_star_ray.pipelines import multimodal as mm

    imgs = [_gradient_img(12, 20, 3), _gradient_img(9, 7, 1)]
    payloads = [jpeg.encode_jpeg(a, quality=95) for a in imgs]
    payloads.append(b"audio-ish payload, no codec")
    media = rd.from_arrow(
        pa.table(
            {
                "media_id": pa.array([0, 1, 2], pa.int64()),
                "kind": ["image", "image", "audio"],
                "payload": pa.array(payloads, pa.binary()),
            }
        )
    )
    got = (
        mm.decode_media(media, batch_size=2)
        .to_pandas().sort_values("media_id").reset_index(drop=True)
    )
    assert list(got["width"][:2]) == [12, 9]
    assert list(got["height"][:2]) == [20, 7]
    np.testing.assert_allclose(
        np.array(list(got["feature"][0])),
        png.grayscale_feature(jpeg.decode_jpeg(payloads[0])),
        rtol=1e-6,
    )
    import hashlib as hl

    digest = hl.sha256(payloads[2]).digest()
    assert got["width"][2] == 16 + digest[0] % 64  # fake path: audio only


def test_resize_stage_real_jpeg_path():
    from etl_pipeline_rdf_star_ray.functions import jpeg, png
    from etl_pipeline_rdf_star_ray.pipelines import multimodal as mm

    arr = _gradient_img(10, 6, 3)
    batch = pa.table(
        {
            "media_id": pa.array([0], pa.int64()),
            "payload": pa.array([jpeg.encode_jpeg(arr, quality=95)], pa.binary()),
        }
    )
    out = mm.ResizeStage(4, 4)(batch)
    resized_payload = out.column("payload")[0].as_py()
    assert jpeg.is_jpeg(resized_payload)  # re-encoded in the source format
    resized = jpeg.decode_jpeg(resized_payload)
    assert resized.shape == (4, 4, 3)
    want = png.resize_nearest(jpeg.decode_jpeg(batch.column("payload")[0].as_py()), 4, 4)
    assert np.abs(resized.astype(int) - want.astype(int)).mean() < 4
    assert out.column("width")[0].as_py() == 4


# ---------------------------------------------------------------------------
# WAV codec + audio feature stage (round 4): real audio path
# ---------------------------------------------------------------------------


def test_wav_roundtrip_mono_stereo():
    from etl_pipeline_rdf_star_ray.functions import wav

    rng = np.random.default_rng(11)
    for ch in (1, 2):
        sig = rng.uniform(-0.9, 0.9, size=(1000, ch))
        data = wav.encode_wav(sig, 16000)
        assert wav.is_wav(data)
        out, rate = wav.decode_wav(data)
        assert rate == 16000 and out.shape == (1000, ch)
        # error bound: 0.5/32768 rounding + |sig|/32768 from the standard
        # asymmetric scale (encode ×32767, decode ÷32768)
        assert np.abs(out - sig).max() <= 1.5 / 32768 + 1e-12
        assert wav.wav_info(data) == (16000, 1000, ch)


def test_wav_rejections_are_explicit():
    import struct

    import pytest as _pytest

    from etl_pipeline_rdf_star_ray.functions import wav

    assert not wav.is_wav(b"RIFFxxxxNOPE")
    with _pytest.raises(wav.WavError, match="signature"):
        wav.decode_wav(b"plain bytes")
    # compressed format id is rejected by name, not mis-decoded
    data = bytearray(wav.encode_wav(np.zeros(16), 8000))
    fmt_at = data.find(b"fmt ") + 8
    data[fmt_at : fmt_at + 2] = struct.pack("<H", 2)  # ADPCM
    with _pytest.raises(wav.WavError, match="compressed"):
        wav.decode_wav(bytes(data))


def test_audio_feature_stage_real_and_fake_paths(ray_session):
    from etl_pipeline_rdf_star_ray.functions import wav
    from etl_pipeline_rdf_star_ray.pipelines import multimodal as mm

    t = np.arange(800) / 8000.0
    sig = 0.5 * np.sin(2 * np.pi * 200 * t)
    payloads = [wav.encode_wav(sig, 8000), b"mp3-ish bytes, no codec"]
    media = rd.from_arrow(
        pa.table(
            {
                "media_id": pa.array([0, 1], pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )
    )
    got = (
        mm.audio_features(media, allow_fake=True)
        .to_pandas().sort_values("media_id").reset_index(drop=True)
    )
    assert got["sample_rate"][0] == 8000 and got["n_samples"][0] == 800
    assert got["duration_s"][0] == 0.1
    # rms of a 0.5-amplitude sine ≈ 0.5/sqrt(2) ≈ 0.3535 (quantized, floored)
    assert abs(got["rms"][0] - 0.3535) < 2e-3
    assert abs(got["peak"][0] - 0.5) < 2e-3
    # non-WAV row took the deterministic fake (zero features)
    assert got["rms"][1] == 0.0 and got["peak"][1] == 0.0
    # strict mode raises on the non-WAV payload
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        mm.AudioFeatureStage()(
            pa.table(
                {
                    "media_id": pa.array([9], pa.int64()),
                    "payload": pa.array([b"nope"], pa.binary()),
                }
            )
        )


def test_decode_stage_undecodable_jpeg_falls_back_to_fake(ray_session):
    """Review r4: a payload with JPEG magic the pure-Python codec cannot
    decode (progressive SOF2, truncated) must take the deterministic fake,
    not kill the actor task."""
    from etl_pipeline_rdf_star_ray.functions import jpeg
    from etl_pipeline_rdf_star_ray.pipelines import multimodal as mm

    good = jpeg.encode_jpeg(_gradient_img(8, 8, 1))
    progressive = bytearray(good)
    progressive[progressive.index(b"\xff\xc0") + 1] = 0xC2
    truncated = good[:40]
    media = rd.from_arrow(
        pa.table(
            {
                "media_id": pa.array([0, 1, 2], pa.int64()),
                "payload": pa.array(
                    [good, bytes(progressive), truncated], pa.binary()
                ),
            }
        )
    )
    got = (
        mm.decode_media(media, batch_size=4)
        .to_pandas().sort_values("media_id").reset_index(drop=True)
    )
    assert got["width"][0] == 8  # real path still real
    import hashlib as hl

    for i, payload in [(1, bytes(progressive)), (2, truncated)]:
        d = hl.sha256(payload).digest()
        assert got["width"][i] == 16 + d[0] % 64  # fake path, no crash


def test_resize_stage_undecodable_respects_allow_fake():
    import pytest as _pytest

    from etl_pipeline_rdf_star_ray.functions import jpeg
    from etl_pipeline_rdf_star_ray.pipelines import multimodal as mm

    progressive = bytearray(jpeg.encode_jpeg(_gradient_img(8, 8, 1)))
    progressive[progressive.index(b"\xff\xc0") + 1] = 0xC2
    batch = pa.table(
        {
            "media_id": pa.array([0], pa.int64()),
            "payload": pa.array([bytes(progressive)], pa.binary()),
        }
    )
    out = mm.ResizeStage(4, 4, allow_fake=True)(batch)
    assert out.column("payload")[0].as_py() == bytes(progressive)  # untouched
    with _pytest.raises(jpeg.JpegError):
        mm.ResizeStage(4, 4)(batch)  # strict mode surfaces the parse error


def test_audio_stage_compressed_wav_respects_allow_fake():
    import struct

    import pytest as _pytest

    from etl_pipeline_rdf_star_ray.functions import wav
    from etl_pipeline_rdf_star_ray.pipelines import multimodal as mm

    adpcm = bytearray(wav.encode_wav(np.zeros(64), 8000))
    at = adpcm.find(b"fmt ") + 8
    adpcm[at : at + 2] = struct.pack("<H", 2)  # ADPCM format code
    batch = pa.table(
        {
            "media_id": pa.array([0], pa.int64()),
            "payload": pa.array([bytes(adpcm)], pa.binary()),
        }
    )
    got = mm.AudioFeatureStage(allow_fake=True)(batch)
    assert got.column("rms")[0].as_py() == 0.0  # fake, not a crash
    with _pytest.raises(wav.WavError):
        mm.AudioFeatureStage()(batch)


def test_wav_zero_channels_is_wav_error():
    import struct

    import pytest as _pytest

    from etl_pipeline_rdf_star_ray.functions import wav

    bad = bytearray(wav.encode_wav(np.zeros(16), 8000))
    at = bad.find(b"fmt ") + 10  # channels field
    bad[at : at + 2] = struct.pack("<H", 0)
    with _pytest.raises(wav.WavError, match="channel"):
        wav.decode_wav(bytes(bad))


def test_jpeg_dqt_is_spec_zigzag_annex_k():
    """Review r4: the DQT payload must be the Annex-K table in ZIGZAG order
    (T.81 defines DQT that way); spot-check a few known positions."""
    from etl_pipeline_rdf_star_ray.functions import jpeg

    enc = jpeg.encode_jpeg(_gradient_img(8, 8, 1), quality=50)  # scale = 1.0
    at = enc.index(b"\xff\xdb") + 5  # skip marker, length, pq/tq byte
    table = list(enc[at : at + 64])
    want = jpeg.QUANT_LUMA[jpeg.ZIGZAG].tolist()
    assert table == want
    # zigzag index 2 must be natural position (1,0)=12, not (0,2)=10
    assert table[2] == 12


# ---------------------------------------------------------------------------
# PII scrub + repetition features (round 4)
# ---------------------------------------------------------------------------


def _pii_oracle_sql() -> str:
    from etl_pipeline_rdf_star_ray.functions.text import PII_RULES

    p = {n: pat for n, pat, _ in PII_RULES}
    return f"""
WITH s1 AS (SELECT doc_id, len(regexp_extract_all(text, '{p["email"]}'))::BIGINT n_email,
            regexp_replace(text, '{p["email"]}', '<EMAIL>', 'g') t1 FROM t),
s2 AS (SELECT *, len(regexp_extract_all(t1, '{p["ip"]}'))::BIGINT n_ip,
       regexp_replace(t1, '{p["ip"]}', '<IP>', 'g') t2 FROM s1),
s3 AS (SELECT *, len(regexp_extract_all(t2, '{p["phone"]}'))::BIGINT n_phone,
       regexp_replace(t2, '{p["phone"]}', '<PHONE>', 'g') t3 FROM s2)
SELECT doc_id, t3 AS text, n_email, n_ip, n_phone FROM s3 ORDER BY doc_id
"""


def test_pii_scrub_matches_duckdb_and_redacts():
    import duckdb

    from etl_pipeline_rdf_star_ray.functions.text import pii_scrub

    rng = np.random.default_rng(21)
    words = ["alpha", "beta", "10.1", "a@b", "555", "+49"]
    texts = []
    for i in range(400):
        parts = list(rng.choice(words, rng.integers(0, 12)))
        if i % 4 == 0:
            parts.append(f"user.{i}+x@ex-ample.org")
        if i % 5 == 0:
            parts.append(f"192.168.{i % 256}.{(i * 7) % 256}")
        if i % 6 == 0:
            parts.append(f"+1 (555) {i:04d}-99")
        texts.append(
            " ".join(parts) if i % 9 else (None if i % 2 else "")
        )
    df = pd.DataFrame(
        {"doc_id": np.arange(400, dtype=np.int64), "text": texts}
    )
    got = (
        pii_scrub(pa.Table.from_pandas(df, preserve_index=False))
        .to_pandas()[["doc_id", "text", "n_email", "n_ip", "n_phone"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(_pii_oracle_sql()).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    hits = want[["n_email", "n_ip", "n_phone"]].sum()
    assert (hits > 0).all()  # every category actually fired
    scrubbed = " ".join(x for x in got.text.dropna())
    assert "@ex-ample.org" not in scrubbed and "192.168." not in scrubbed
    # NULL text stays NULL with NULL counts (SQL regexp-over-NULL semantics)
    nulls = got[df.sort_values("doc_id").text.isna().to_numpy()]
    assert nulls.text.isna().all() and nulls.n_email.isna().all()


def test_repetition_features_matches_duckdb():
    import duckdb

    from etl_pipeline_rdf_star_ray.functions.text import repetition_features

    rng = np.random.default_rng(33)
    texts = []
    for i in range(300):
        lines = [
            " ".join(rng.choice(["dup", "uniq", f"w{j}"], 4))
            for j in range(int(rng.integers(1, 6)))
        ]
        if i % 3 == 0:
            lines.append(lines[0])  # a genuinely duplicated full line
        texts.append(
            "\n".join(lines) if i % 7 else (None if i % 2 else "")
        )
    df = pd.DataFrame(
        {"doc_id": np.arange(300, dtype=np.int64), "text": texts}
    )
    got = (
        repetition_features(pa.Table.from_pandas(df, preserve_index=False))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(
        r"""
WITH w AS (
  SELECT doc_id,
         unnest(array_filter(string_split_regex(coalesce(text, ''), '\s+'),
                             x -> x <> '')) AS word
  FROM documents),
wc AS (SELECT doc_id, word, count(*)::BIGINT AS c FROM w GROUP BY 1, 2),
wa AS (SELECT doc_id, sum(c)::BIGINT AS n_words,
              count(*)::BIGINT AS n_distinct_words, max(c)::BIGINT AS top_c
       FROM wc GROUP BY 1)
SELECT d.doc_id,
  coalesce(n_words, 0) AS n_words,
  coalesce(n_distinct_words, 0) AS n_distinct_words,
  CASE WHEN coalesce(n_words, 0) = 0 THEN 0
       ELSE floor(top_c::DOUBLE / n_words * 10000) / 10000 END AS top_word_frac,
  CASE WHEN d.text IS NULL THEN 0
       ELSE len(string_split(d.text, chr(10))) END::BIGINT AS n_lines,
  CASE WHEN d.text IS NULL OR len(string_split(d.text, chr(10))) = 0 THEN 0
       ELSE floor((len(string_split(d.text, chr(10)))
                   - len(list_distinct(string_split(d.text, chr(10)))))::DOUBLE
                  / len(string_split(d.text, chr(10))) * 10000) / 10000 END
    AS dup_line_frac
FROM documents d LEFT JOIN wa USING (doc_id) ORDER BY d.doc_id
"""
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (want.dup_line_frac > 0).any()  # the dup-line path really ran
    assert (want.top_word_frac > 0).any()


# ---------------------------------------------------------------------------
# round 5: partition-pruned ANN index (r4 verdict item 2) — the query path
# must READ only its probed hive partitions, proven by capturing the exact
# path list handed to read_parquet, and return results identical to the
# corpus-scan path.
# ---------------------------------------------------------------------------


def _capture_reads(monkeypatch):
    captured = []
    real_read = similarity.rd.read_parquet

    def capture(paths, **kw):
        captured.append(list(paths) if isinstance(paths, list) else [paths])
        return real_read(paths, **kw)

    monkeypatch.setattr(similarity.rd, "read_parquet", capture)
    return captured


def test_lsh_index_pruned_read(tmp_path, monkeypatch):
    embs = pq.read_table(f"{SF}/embeddings.parquet")
    q = np.array(embs.sort_by("vec_id").column("embedding")[0].as_py())
    root = str(tmp_path / "lshidx")
    manifest = similarity.build_lsh_index(_embs_ds(), root).to_pandas()
    assert not manifest["skipped"].any()
    assert manifest["rows"].sum() == embs.num_rows

    captured = _capture_reads(monkeypatch)
    got = similarity.cosine_topk_lsh_indexed(root, q, k=5).to_pandas()
    qb = similarity._lsh_bucket_of(np.asarray(q, dtype=np.float64), 8, 42)
    # exactly ONE partition file read, and it is the query's own bucket
    assert captured == [[f"{root}/bucket={qb}/part.parquet"]]
    scan = similarity.cosine_topk_lsh(_embs_ds(), q, k=5).to_pandas()
    assert got["vec_id"].tolist() == scan["vec_id"].tolist()
    assert np.array_equal(got["cosine"].values, scan["cosine"].values)

    # multi-probe: ≤ planes+1 partitions, never the whole corpus
    captured.clear()
    got1 = similarity.cosine_topk_lsh_indexed(root, q, k=5, hamming=1).to_pandas()
    assert len(captured) == 1 and len(captured[0]) <= 9
    assert got1.iloc[0]["vec_id"] == 0 and got1.iloc[0]["cosine"] >= 0.9999
    # a superset candidate pool can only improve the top-k: elementwise
    # cosine dominance over the exact-bucket answer (padded comparison)
    n = min(len(got), len(got1))
    assert (got1["cosine"].values[:n] >= got["cosine"].values[:n]).all()
    assert len(got1) >= len(got)

    # resumable: rebuild skips every committed partition
    m2 = similarity.build_lsh_index(_embs_ds(), root).to_pandas()
    assert m2["skipped"].all()


def test_ivf_index_pruned_read(tmp_path, monkeypatch):
    embs = pq.read_table(f"{SF}/embeddings.parquet")
    q = np.array(embs.sort_by("vec_id").column("embedding")[0].as_py())
    root = str(tmp_path / "ivfidx")
    manifest = similarity.build_ivf_index(
        _embs_ds(), root, num_centroids=4
    ).to_pandas()
    assert manifest["rows"].sum() == embs.num_rows

    captured = _capture_reads(monkeypatch)
    pruned = similarity.cosine_topk_ivf_indexed(root, q, k=5, nprobe=2).to_pandas()
    assert len(captured) == 1 and len(captured[0]) <= 2
    assert all("ivf_cell=" in p for p in captured[0])
    assert pruned.iloc[0]["vec_id"] == 0  # query's own vector is in its nearest cell

    # full probe degenerates to brute force (same guarantee as the scan path)
    captured.clear()
    full = similarity.cosine_topk_ivf_indexed(root, q, k=5, nprobe=4).to_pandas()
    brute = similarity.cosine_topk(_embs_ds(), q, k=5).to_pandas()
    assert full["vec_id"].tolist() == brute["vec_id"].tolist()
    assert np.array_equal(full["cosine"].values, brute["cosine"].values)
