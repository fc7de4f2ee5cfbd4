"""Behavioral tests for the curation/similarity extensions (llm/curation,
docs_cluster_assign, emb_knn_join) — the cross-engine exactness gate is
tests/test_oracle_parity.py; these pin the operator semantics directly."""

from __future__ import annotations

from pyspark.sql import functions as F

from flinkrunner_spark.llm import curation
from flinkrunner_spark.llm import similarity as sim

SF = "/root/testdata/sf0.001"


def test_pii_redact_counts_and_replaces(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@corp.io or admin@a.b.co thanks"),
            (2, "call 555-123-4567 and 999-000-1111 now"),
            (3, "ssn 123-45-6789 leaked"),
            (4, "clean text with no identifiers"),
            (5, "mixed a@b.cc 123-456-7890 987-65-4321"),
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in curation.pii_redact(df).collect()}
    assert (out[1]["n_emails"], out[1]["n_phones"], out[1]["n_ssns"]) == (2, 0, 0)
    assert out[1]["redacted"] == "mail me at <EMAIL> or <EMAIL> thanks"
    assert out[2]["n_phones"] == 2
    assert out[2]["redacted"] == "call <PHONE> and <PHONE> now"
    assert out[3]["n_ssns"] == 1
    assert out[3]["redacted"] == "ssn <SSN> leaked"
    assert out[4]["redacted"] == out[4]["text"]
    assert (out[5]["n_emails"], out[5]["n_phones"], out[5]["n_ssns"]) == (1, 1, 1)
    assert out[5]["redacted"] == "mixed <EMAIL> <PHONE> <SSN>"


def test_pii_phone_ssn_shapes_do_not_cross_match(spark):
    # 3-3-4 is a phone, 3-2-4 is an SSN; neither pattern may eat the other
    df = spark.createDataFrame(
        [(1, "p 111-222-3333 s 111-22-3333")], "doc_id int, text string"
    )
    r = curation.pii_redact(df).first()
    assert (r["n_phones"], r["n_ssns"]) == (1, 1)
    assert r["redacted"] == "p <PHONE> s <SSN>"


def test_decontaminate_partitions_corpus(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_docs = docs.count()
    n_eval = docs.select(curation.eval_bucket_col().alias("b")).filter(
        "b = 0"
    ).count()
    out = curation.docs_decontaminate(spark, SF)
    rows = out.collect()
    # output covers exactly the training split (eval docs are the query set)
    assert len(rows) == n_docs - n_eval
    for r in rows:
        assert 0 <= r["n_overlap"] <= r["n_shingles"]
        assert r["contaminated"] == (
            r["n_overlap"] / r["n_shingles"] >= curation.CONTAM_FRAC
        )
    # the synthetic word-salad corpus shares 3-grams: both classes present
    flags = {r["contaminated"] for r in rows}
    assert flags == {True, False}


def test_repetition_fractions_are_valid(spark):
    rows = curation.docs_repetition(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert len(rows) == docs.count()
    for r in rows:
        assert r["n_2grams"] == max(r["n_tokens"] - 1, 0)
        assert 0.0 <= r["dup_token_frac"] <= 1.0
        assert 0.0 <= r["dup_2gram_frac"] <= 1.0
        if r["n_2grams"]:
            assert 0.0 < r["top_2gram_frac"] <= 1.0


def test_cluster_assign_is_total_and_nearest(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    labels = {r["label"] for r in emb.select("label").distinct().collect()}
    rows = sim.docs_cluster_assign(spark, SF).collect()
    assert len(rows) == emb.count()  # every vector assigned
    for r in rows[:50]:
        assert r["assigned_label"] in labels
        assert -1.0 <= r["cosine"] <= 1.0
    # spot-check argmax against a direct per-centroid computation
    cents = {
        r["label"]: r["centroid"]
        for r in sim._label_centroids(emb).collect()
    }
    import numpy as np

    probe = {r["vec_id"]: r for r in rows if r["vec_id"] < 20}
    for r0 in emb.filter("vec_id < 20").collect():
        e = np.asarray(r0["embedding"], dtype=np.float64)
        best = max(
            sorted(cents),
            key=lambda lb: (
                round(
                    float(
                        np.dot(e, cents[lb])
                        / np.sqrt(np.dot(e, e) * np.dot(np.asarray(cents[lb]), np.asarray(cents[lb])))
                    ),
                    6,
                ),
                -lb,
            ),
        )
        assert probe[r0["vec_id"]]["assigned_label"] == best


def test_knn_join_shape(spark):
    rows = sim.emb_knn_join(spark, SF).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_vec_id"], []).append(r)
    for q, rs in by_q.items():
        assert q % sim.KNN_JOIN_STRIDE == 0
        assert len(rs) == sim.KNN_JOIN_K
        assert sorted(r["rk"] for r in rs) == list(range(1, sim.KNN_JOIN_K + 1))
        assert all(r["vec_id"] != q for r in rs)
        # ranks ordered by descending cosine (ties broken by vec_id)
        srt = sorted(rs, key=lambda r: r["rk"])
        cos = [r["cosine"] for r in srt]
        assert cos == sorted(cos, reverse=True)


def test_pii_redact_property(spark):
    """Property: PII-free text is untouched; injected PII is counted and
    fully removed (no digits of a phone/SSN survive, no '@' survives an
    email redaction)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    clean_word = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=8
    )

    @settings(max_examples=30, deadline=None)
    @given(
        words=st.lists(clean_word, min_size=1, max_size=10),
        n_email=st.integers(min_value=0, max_value=2),
        n_phone=st.integers(min_value=0, max_value=2),
        seed=st.integers(min_value=0, max_value=999),
    )
    def check(words, n_email, n_phone, seed):
        text = " ".join(words)
        for i in range(n_email):
            text += f" u{seed}{i}@ex{seed}.com"
        for i in range(n_phone):
            text += f" {100 + seed % 900:03d}-555-{1000 + i:04d}"
        df = spark.createDataFrame([(1, text)], "doc_id int, text string")
        r = curation.pii_redact(df).first()
        assert r["n_emails"] == n_email
        assert r["n_phones"] == n_phone
        if n_email == 0 and n_phone == 0:
            assert r["redacted"] == text
        else:
            assert "@" not in r["redacted"]
            assert "-555-" not in r["redacted"]

    check()


def test_langid_ngram_classifies_held_out_text(spark):
    """The char-trigram NB profiles must generalize past their seed
    corpora: five HELD-OUT natural sentences (one per language, none
    sharing seed wording) all classify correctly, trigram-less input is
    'und', and the trained profile is import-deterministic."""
    from flinkrunner_spark.llm.text import (
        LANGID_MISS,
        LANGID_PROFILE,
        _langid_train,
        langid_ngram_cols,
    )

    held_out = [
        ("de", "die katze schlaeft auf dem warmen sofa und der hund "
               "liegt daneben im zimmer"),
        ("en", "the cat sleeps on the warm sofa and the dog lies next "
               "to it in the room"),
        ("es", "el gato duerme sobre el sofa caliente y el perro esta "
               "al lado en la habitacion"),
        ("fr", "le chat dort sur le canape chaud et le chien est "
               "couche a cote dans la chambre"),
        ("zh", "xiao mao zai wen nuan de sha fa shang shui jiao gou "
               "zai pang bian de fang jian li"),
        ("und", "12 34 ?!"),  # no [a-z] trigrams after normalization
    ]
    df = spark.createDataFrame(held_out, "lang string, text string")
    cols = langid_ngram_cols()
    got = {
        r["lang"]: r["pred"]
        for r in df.select(
            "lang", cols["lang_pred"].alias("pred")
        ).collect()
    }
    assert got == {l: l for l, _ in held_out}
    # deterministic retrain: same profile, same miss weights
    p2, m2 = _langid_train()
    assert p2 == LANGID_PROFILE and m2 == LANGID_MISS
    # integer weights only (the engine-exactness contract)
    assert all(
        isinstance(w, int) for _tri, ws in LANGID_PROFILE for w in ws
    )


def test_langid_ngram_plan_is_zero_exchange(spark):
    """langid stays a map-side projection — no explode, no join, no
    shuffle (the 100 TB shape: profiles are literals, scores are
    per-row folds)."""
    from flinkrunner_spark.llm.text import docs_langid_ngram

    q = docs_langid_ngram(spark, "/root/testdata/sf0.001")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 0
