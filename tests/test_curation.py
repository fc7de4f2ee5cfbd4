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


# 96 held-out sentences (12/language, 8 languages), disjoint from the
# seed corpora in llm/text.py — the r12 verdict's capacity pin: the
# grown profiles must score >= 95% overall AND >= 10/12 per language.
# At the pinned top-K=64 they score 93/96: the three misses are short
# it/pt sentences falling to their Romance neighbors (pt's most
# distinctive characters ã ç õ are stripped by the shared [^a-z]+
# normalization — the documented hard case; K=96/128 do not recover
# them). Natural orthography on purpose: accents/umlauts exercise the
# normalization path end-to-end.
LANGID_HELD_OUT = [
    ("de", "die katze schläft auf dem warmen sofa und der hund liegt daneben im zimmer"),
    ("de", "wir haben gestern abend einen langen film über das leben im meer gesehen"),
    ("de", "der lehrer erklärt den schülern die aufgabe noch einmal ganz langsam"),
    ("de", "im herbst werden die blätter bunt und fallen von den bäumen auf die straße"),
    ("de", "bitte schließen sie das fenster es wird kalt hier drinnen"),
    ("de", "unsere nachbarn haben einen neuen wagen gekauft und fahren damit ans meer"),
    ("de", "das kind lernt schwimmen und taucht mutig unter das wasser"),
    ("de", "am wochenende besuchen wir unsere großeltern auf dem land"),
    ("de", "der bäcker backt jeden morgen frisches brot und süße brötchen"),
    ("de", "die musik war so laut dass wir unsere eigenen worte nicht verstehen konnten"),
    ("de", "er arbeitet seit vielen jahren als arzt in einem großen krankenhaus"),
    ("de", "der alte mann erzählt den kindern geschichten aus seiner jugend"),
    ("en", "the cat sleeps on the warm sofa and the dog lies next to it in the room"),
    ("en", "we watched a long movie about life in the ocean yesterday evening"),
    ("en", "the teacher explains the task to the students once more very slowly"),
    ("en", "in autumn the leaves turn colorful and fall from the trees onto the street"),
    ("en", "please close the window it is getting cold in here"),
    ("en", "our neighbors bought a new car and are driving it to the seaside"),
    ("en", "the child is learning to swim and bravely dives under the water"),
    ("en", "on the weekend we visit our grandparents in the countryside"),
    ("en", "the baker bakes fresh bread and sweet rolls every morning"),
    ("en", "the music was so loud that we could not understand our own words"),
    ("en", "he has worked as a doctor in a large hospital for many years"),
    ("en", "the old man tells the children stories from his youth"),
    ("es", "el gato duerme sobre el sofá caliente y el perro está al lado en la habitación"),
    ("es", "anoche vimos una película larga sobre la vida en el océano"),
    ("es", "el maestro explica la tarea a los estudiantes otra vez muy despacio"),
    ("es", "en otoño las hojas se vuelven de colores y caen de los árboles a la calle"),
    ("es", "por favor cierre la ventana hace frío aquí dentro"),
    ("es", "nuestros vecinos compraron un coche nuevo y van con él a la playa"),
    ("es", "el niño aprende a nadar y se sumerge valiente bajo el agua"),
    ("es", "el fin de semana visitamos a nuestros abuelos en el campo"),
    ("es", "el panadero hace pan fresco y bollos dulces cada mañana"),
    ("es", "la música estaba tan fuerte que no podíamos entender nuestras propias palabras"),
    ("es", "él trabaja desde hace muchos años como médico en un gran hospital"),
    ("es", "el hombre viejo cuenta a los niños historias de su juventud"),
    ("fr", "le chat dort sur le canapé chaud et le chien est couché à côté dans la chambre"),
    ("fr", "hier soir nous avons regardé un long film sur la vie dans l océan"),
    ("fr", "le professeur explique encore une fois la tâche aux élèves très lentement"),
    ("fr", "en automne les feuilles deviennent colorées et tombent des arbres sur la rue"),
    ("fr", "fermez la fenêtre s il vous plaît il commence à faire froid ici"),
    ("fr", "nos voisins ont acheté une nouvelle voiture et partent avec elle à la mer"),
    ("fr", "l enfant apprend à nager et plonge courageusement sous l eau"),
    ("fr", "le week end nous rendons visite à nos grands parents à la campagne"),
    ("fr", "le boulanger fait du pain frais et des petits pains sucrés chaque matin"),
    ("fr", "la musique était si forte que nous ne pouvions pas comprendre nos propres mots"),
    ("fr", "il travaille depuis de nombreuses années comme médecin dans un grand hôpital"),
    ("fr", "le vieil homme raconte aux enfants des histoires de sa jeunesse"),
    ("it", "il gatto dorme sul divano caldo e il cane è sdraiato accanto nella stanza"),
    ("it", "ieri sera abbiamo visto un lungo film sulla vita nell oceano"),
    ("it", "l insegnante spiega ancora una volta il compito agli studenti molto lentamente"),
    ("it", "in autunno le foglie diventano colorate e cadono dagli alberi sulla strada"),
    ("it", "per favore chiudi la finestra comincia a fare freddo qui dentro"),
    ("it", "i nostri vicini hanno comprato una macchina nuova e vanno con essa al mare"),
    ("it", "il bambino impara a nuotare e si tuffa coraggioso sotto l acqua"),
    ("it", "nel fine settimana visitiamo i nostri nonni in campagna"),
    ("it", "il fornaio prepara ogni mattina pane fresco e dolci deliziosi"),
    ("it", "la musica era così forte che non potevamo capire le nostre parole"),
    ("it", "lavora da molti anni come medico in un grande ospedale"),
    ("it", "il vecchio racconta ai bambini storie della sua giovinezza"),
    ("nl", "de kat slaapt op de warme bank en de hond ligt ernaast in de kamer"),
    ("nl", "gisteravond hebben we een lange film over het leven in de oceaan gezien"),
    ("nl", "de leraar legt de opdracht nog een keer heel langzaam aan de leerlingen uit"),
    ("nl", "in de herfst worden de bladeren kleurig en vallen ze van de bomen op straat"),
    ("nl", "doe alsjeblieft het raam dicht het wordt koud hier binnen"),
    ("nl", "onze buren hebben een nieuwe auto gekocht en rijden ermee naar zee"),
    ("nl", "het kind leert zwemmen en duikt dapper onder water"),
    ("nl", "in het weekend bezoeken we onze grootouders op het platteland"),
    ("nl", "de bakker bakt elke ochtend vers brood en zoete broodjes"),
    ("nl", "de muziek was zo hard dat we onze eigen woorden niet konden verstaan"),
    ("nl", "hij werkt al vele jaren als arts in een groot ziekenhuis"),
    ("nl", "de oude man vertelt de kinderen verhalen uit zijn jeugd"),
    ("pt", "o gato dorme no sofá quente e o cachorro está deitado ao lado no quarto"),
    ("pt", "ontem à noite assistimos a um longo filme sobre a vida no oceano"),
    ("pt", "o professor explica a tarefa aos alunos mais uma vez bem devagar"),
    ("pt", "no outono as folhas ficam coloridas e caem das árvores na rua"),
    ("pt", "por favor feche a janela está ficando frio aqui dentro"),
    ("pt", "nossos vizinhos compraram um carro novo e vão com ele para a praia"),
    ("pt", "a criança aprende a nadar e mergulha corajosa debaixo da água"),
    ("pt", "no fim de semana visitamos nossos avós no campo"),
    ("pt", "o padeiro faz pão fresco e doces todas as manhãs"),
    ("pt", "a música estava tão alta que não conseguíamos entender nossas próprias palavras"),
    ("pt", "ele trabalha há muitos anos como médico em um grande hospital"),
    ("pt", "o velho conta às crianças histórias da sua juventude"),
    ("zh", "xiao mao zai wen nuan de sha fa shang shui jiao gou zai pang bian de fang jian li"),
    ("zh", "zuo tian wan shang wo men kan le yi bu guan yu hai yang sheng huo de dian ying"),
    ("zh", "lao shi man man di gei xue sheng men zai jie shi yi bian zuo ye"),
    ("zh", "qiu tian shu ye bian cheng cai se cong shu shang luo dao jie dao shang"),
    ("zh", "qing guan shang chuang hu li mian kai shi bian leng le"),
    ("zh", "wo men de lin ju mai le yi liang xin che kai zhe qu hai bian"),
    ("zh", "hai zi zheng zai xue you yong yong gan di qian dao shui xia"),
    ("zh", "zhou mo wo men qu xiang xia kan wang wo men de zu fu mu"),
    ("zh", "shi fu mei tian zao shang zuo xin xian de mian bao he tian dian"),
    ("zh", "yin yue tai da sheng le wo men ting bu dao zi ji shuo de hua"),
    ("zh", "ta zuo wei yi sheng zai yi jia da yi yuan gong zuo le hen duo nian"),
    ("zh", "lao ren gei hai zi men jiang ta nian qing shi hou de gu shi"),
]


def test_langid_ngram_classifies_held_out_text(spark):
    """The char-trigram NB profiles must generalize past their seed
    corpora: the 96-sentence held-out set (8 languages) scores >= 95%
    overall and >= 10/12 per language through the
    ACTUAL Spark Column expressions, the r12 transliterated sentences
    still classify, trigram-less input is 'und', and the trained
    profile is import-deterministic."""
    from flinkrunner_spark.llm.text import (
        LANGID_MISS,
        LANGID_PROFILE,
        _langid_train,
        langid_ngram_cols,
    )

    legacy = [
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
    cols = langid_ngram_cols()

    def preds(data):
        df = spark.createDataFrame(data, "lang string, text string")
        return df.select(
            "lang", "text", cols["lang_pred"].alias("pred")
        ).collect()

    held = preds(LANGID_HELD_OUT)
    acc = sum(r["pred"] == r["lang"] for r in held) / len(held)
    assert len(held) == len(LANGID_HELD_OUT) >= 96
    assert acc >= 0.95, [
        (r["lang"], r["pred"], r["text"]) for r in held
        if r["pred"] != r["lang"]
    ]
    # per-language floor: no language may silently collapse into a
    # neighbor even while the overall average stays green
    per = {}
    for r in held:
        ok, n = per.get(r["lang"], (0, 0))
        per[r["lang"]] = (ok + (r["pred"] == r["lang"]), n + 1)
    for lang, (ok, n) in per.items():
        assert ok >= n - 2, (lang, ok, n)
    for r in preds(legacy):
        assert r["pred"] == r["lang"], (r["lang"], r["pred"])
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
