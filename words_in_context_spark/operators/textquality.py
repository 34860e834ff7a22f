"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All pure built-in expressions (JVM-side), all with
exact DuckDB oracle twins (portable md5 / string ops only).

These generalize the reference's corpus hygiene steps — language detection
(/root/reference/extract_words.py:165-181) and the alpha/punctuation filters
(:83-87,262-264) — into the filters a 100 TB training-data pipeline runs
before indexing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker lists (public, common knowledge).
# Validated against the reference's golden 13-file language map
# (/root/reference/test/test_detect_languages.py:13-32) in
# tests/test_pipeline_ops.py::test_lang_id_matches_reference_golden_map.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "you", "that", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ich", "ein"],
    "es": ["el", "la", "de", "que", "y", "los", "es", "un"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "est"],
    "it": ["il", "di", "che", "non", "per", "con", "sono", "una"],
    "pt": ["o", "de", "que", "do", "da", "em", "um", "para"],
    "nl": ["de", "het", "een", "en", "van", "ik", "dat", "niet"],
    "ru": ["и", "в", "не", "на", "я", "что", "он", "это"],
    "sv": ["och", "att", "det", "som", "en", "på", "är", "av"],
    "pl": ["nie", "się", "w", "na", "i", "z", "do", "że"],
    # breadth extension toward the reference's ~55-language langdetect
    # coverage (extract_words.py:165-181). Markers chosen to be distinctive:
    # bare single letters shared with high-frequency English/Romance tokens
    # (a, e, o, i) are deliberately excluded so they can't steal votes.
    # CJK/Korean are intentionally absent: the \\p{L}-run tokenizer has no
    # word boundaries there — documented gap, 'und' is the honest answer.
    "da": ["og", "jeg", "det", "at", "til", "ikke", "har", "vi"],
    "no": ["og", "jeg", "det", "ikke", "til", "er", "som", "har"],
    "fi": ["ja", "on", "ei", "että", "hän", "se", "mutta", "kun"],
    "tr": ["bir", "ve", "bu", "ne", "için", "ben", "çok", "gibi"],
    "cs": ["se", "na", "že", "je", "to", "ale", "jsem", "jako"],
    "ro": ["și", "în", "la", "este", "nu", "cu", "pentru", "mai"],
    "hu": ["és", "az", "nem", "hogy", "egy", "van", "meg", "már"],
    "uk": ["і", "в", "не", "на", "що", "це", "як", "до"],
    "el": ["και", "το", "να", "δεν", "είναι", "της", "με", "που"],
    "id": ["yang", "dan", "di", "itu", "dengan", "untuk", "tidak", "ini"],
    "vi": ["của", "và", "các", "có", "được", "không", "là", "trong"],
    "ar": ["في", "من", "على", "أن", "إلى", "عن", "مع", "هذا"],
    "he": ["של", "את", "על", "לא", "זה", "אני", "הוא", "עם"],
    # round-4 breadth extension: the remaining space-delimited languages of
    # the reference's langdetect profile set (extract_words.py:165-181).
    # Marker choice rules as above, plus: where two languages share most
    # high-frequency words (cs/sk, bg/mk, nl/af, hi/mr/ne), each list leans
    # on forms DISTINCTIVE for that language so the denser original lists
    # keep winning their own documents. Still out of scope (documented):
    # ja/ko/zh (no word boundaries for the letter-run tokenizer) and th
    # (script runs, no spaces) — those report 'und'.
    "af": ["die", "het", "nie", "vir", "ek", "jy", "wat", "maar"],
    "bg": ["на", "не", "да", "се", "това", "той", "за", "ми"],
    "bn": ["এবং", "না", "আমি", "এই", "করে", "থেকে", "তার", "কিন্তু"],
    "ca": ["és", "amb", "els", "per", "una", "més", "com", "dels"],
    "cy": ["yn", "bod", "wedi", "gan", "fod", "ond", "mae", "hyn"],
    "et": ["ja", "on", "ei", "oli", "aga", "mis", "oma", "nagu"],
    "fa": ["در", "از", "که", "به", "را", "این", "با", "است"],
    "gu": ["અને", "એક", "છે", "તે", "આ", "હું", "ના", "માટે"],
    "hi": ["है", "के", "में", "की", "और", "से", "का", "को"],
    "hr": ["je", "da", "se", "su", "što", "ali", "kao", "nije"],
    "kn": ["ಮತ್ತು", "ಒಂದು", "ಎಂದು", "ಅದು", "ಈ", "ನಾನು", "ಇದೆ", "ಅವರ"],
    "lt": ["ir", "yra", "kad", "tai", "bet", "jis", "su", "kaip"],
    "lv": ["un", "ir", "ka", "tas", "bet", "viņš", "ar", "kā"],
    "mk": ["на", "не", "да", "се", "тоа", "што", "го", "ми"],
    "ml": ["എന്ന", "ഒരു", "ആണ്", "അത്", "ഈ", "ഞാൻ", "ഇല്ല", "അവൻ"],
    "mr": ["आणि", "एक", "आहे", "तो", "हे", "मी", "नाही", "त्या"],
    "ne": ["छ", "छन्", "गर्न", "भएको", "लागि", "हुन्छ", "यो", "हो"],
    "pa": ["ਅਤੇ", "ਇੱਕ", "ਹੈ", "ਦੇ", "ਵਿੱਚ", "ਦੀ", "ਨੂੰ", "ਇਹ"],
    "sk": ["sa", "na", "že", "je", "to", "ale", "som", "ako"],
    "sl": ["je", "da", "se", "ne", "so", "kar", "tudi", "tako"],
    "so": ["oo", "waa", "iyo", "waxaa", "ayaa", "uu", "ku", "soo"],
    "sq": ["dhe", "të", "në", "për", "një", "me", "që", "nuk"],
    "sw": ["na", "ya", "wa", "kwa", "ni", "za", "katika", "hii"],
    "ta": ["மற்றும்", "ஒரு", "என்று", "அது", "இது", "நான்", "அந்த", "உள்ள"],
    "te": ["మరియు", "ఒక", "అని", "ఆ", "ఈ", "నేను", "కాదు", "ఉంది"],
    "tl": ["ang", "ng", "sa", "na", "ay", "mga", "ako", "hindi"],
    "ur": ["کے", "میں", "کی", "اور", "سے", "کا", "کو", "ہے"],
}


def tokens_simple(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    words = F.split(F.lower(F.col(text_col)), r"[^\p{L}]+")
    return docs.select(
        F.col(id_col), F.explode(words).alias("term")
    ).where(F.col("term") != "")


# No-whitespace scripts: stopword-marker voting cannot see them (a CJK/Thai
# sentence is one letter-run "token"), so these languages vote by SCRIPT
# CHARACTER counts instead — closing the reference langdetect tail
# (extract_words.py:165-181: ja/ko/th/zh). Patterns are single character
# classes written in \x{...} form, valid in BOTH Java regex (Spark) and RE2
# (the DuckDB oracle). Han characters count toward Japanese when any kana is
# present (kanji in Japanese text), toward zh only in kana-free documents;
# zh-cn/zh-tw are collapsed to 'zh' (simplified/traditional split is a
# character-frequency problem out of scope for a marker detector).
_KANA = r"[\x{3040}-\x{30FF}]"
_HAN = r"[\x{4E00}-\x{9FFF}]"
_HANGUL = r"[\x{AC00}-\x{D7AF}\x{1100}-\x{11FF}]"
_THAI = r"[\x{0E00}-\x{0E7F}]"


def _script_votes(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, lang, votes) rows for the script-voting languages, zero rows for
    documents without those scripts."""
    text = F.col(text_col)
    kana = F.regexp_count(text, F.lit(_KANA))
    han = F.regexp_count(text, F.lit(_HAN))
    counted = docs.select(
        F.col(id_col),
        F.array(
            F.struct(
                F.lit("ja").alias("lang"),
                F.when(kana > 0, kana + han).otherwise(0).alias("votes"),
            ),
            F.struct(
                F.lit("zh").alias("lang"),
                F.when(kana == 0, han).otherwise(0).alias("votes"),
            ),
            F.struct(
                F.lit("ko").alias("lang"),
                F.regexp_count(text, F.lit(_HANGUL)).alias("votes"),
            ),
            F.struct(
                F.lit("th").alias("lang"),
                F.regexp_count(text, F.lit(_THAI)).alias("votes"),
            ),
        ).alias("sv"),
    )
    ex = counted.select(id_col, F.explode("sv").alias("s")).select(
        id_col, F.col("s.lang").alias("lang"),
        F.col("s.votes").cast("long").alias("votes"),
    )
    return ex.where(F.col("votes") > 0)


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, pred_lang, votes): argmax stopword-marker votes (plus script-
    character votes for the no-whitespace scripts ja/zh/ko/th), tie-break by
    language code asc; 'und' (undetermined) when nothing matches."""
    toks = tokens_simple(docs, id_col, text_col)
    # ONE pass: broadcast the (lang, term) marker dimension and join — the
    # per-language union-of-filters alternative scans the token table once
    # PER LANGUAGE (50 scans at current breadth). A marker shared by two
    # languages contributes a vote to each, same as the oracle's CTE join.
    spark = docs.sparkSession
    markers = spark.createDataFrame(
        [(lang, m) for lang, ms in sorted(LANG_MARKERS.items()) for m in ms],
        "lang string, term string",
    )
    votes = (
        toks.join(F.broadcast(markers), "term")
        .groupBy(id_col, "lang")
        .agg(F.count("*").cast("long").alias("votes"))
        .unionByName(_script_votes(docs, id_col, text_col))
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("votes"), F.asc("lang"))
    best = (
        votes.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(id_col, F.col("lang").alias("pred_lang"), "votes")
    )
    return (
        docs.select(id_col)
        .join(best, id_col, "left")
        .select(
            id_col,
            F.coalesce("pred_lang", F.lit("und")).alias("pred_lang"),
            F.coalesce("votes", F.lit(0)).alias("votes"),
        )
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic doc-quality features + a composite score:
    (id, n_chars, n_tokens, mean_token_len, alpha_ratio, stopword_ratio,
    quality). Ratios rounded to 6dp; the composite is computed from the
    ROUNDED ratios with the oracle's identical expression and deliberately
    NOT re-rounded — the inputs being cross-engine equal makes the raw
    double bit-identical, whereas an outer round(·, 6) lands on decimal
    boundaries (the rounded-inputs sum lives on a 3e-7 grid) that Spark
    (decimal shortest-repr) and DuckDB (binary) resolve differently."""
    text = F.col(text_col)
    n_chars = F.length(text)
    n_alpha = F.length(F.regexp_replace(text, r"[^\p{L}]", ""))
    words = F.split(F.lower(text), r"[^\p{L}]+")
    toks = F.filter(words, lambda w: w != "")
    n_tokens = F.size(toks)
    stop = F.array(*[F.lit(s) for s in LANG_MARKERS["en"]])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stop, w)))
    mean_len = F.round(n_alpha / F.greatest(n_tokens, F.lit(1)), 6)
    alpha_ratio = F.round(n_alpha / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 6)
    quality = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.4
        + alpha_ratio * 0.3
        + stop_ratio * 0.3
    )
    return docs.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        mean_len.alias("mean_token_len"),
        alpha_ratio.alias("alpha_ratio"),
        stop_ratio.alias("stopword_ratio"),
        quality.alias("quality"),
    )


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, ws_tokens, word_tokens, bpe_ish_tokens): whitespace split count,
    letter-run count, and a BPE-ish sub-word proxy (letter runs split at
    4-char boundaries + digit/punct runs — a deterministic stand-in for a
    real tokenizer's piece count)."""
    text = F.col(text_col)
    ws = F.size(F.filter(F.split(text, r"\s+"), lambda w: w != ""))
    words = F.filter(F.split(F.lower(text), r"[^\p{L}]+"), lambda w: w != "")
    word_n = F.size(words)
    # ceil(len/4) pieces per word + one per non-space punct/digit run
    pieces = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.ceil(F.length(w) / 4.0).cast("int")
    )
    other_runs = F.size(
        F.filter(
            F.split(text, r"[\s\p{L}]+"), lambda w: w != ""
        )
    )
    return docs.select(
        F.col(id_col),
        ws.alias("ws_tokens"),
        word_n.alias("word_tokens"),
        (pieces + other_runs).alias("bpe_ish_tokens"),
    )


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition features (Rae et al. 2021's repetition
    filters, the standard pre-training corpus hygiene pass): per document,
    the fraction of words taken by the most frequent unigram, the fraction
    of word characters covered by the most frequent 2-gram, and the
    fraction of word characters inside duplicated 3-grams — plus a
    composite ``keep`` decision. All built-in expressions (explode +
    hash-agg per doc: scale-safe, no UDF).

    (id, n_words, top_unigram_frac, top_bigram_char_frac,
    dup_trigram_char_frac, keep). Fractions are int-ratio → double,
    rounded 6dp (cross-engine exact); ``keep`` is computed from the
    ROUNDED values so the boolean is exact too. Most-frequent n-gram ties
    break by n-gram text ascending (deterministic in both engines)."""
    from pyspark.sql import Window

    words = F.filter(
        F.split(F.lower(F.col(text_col)), r"[^\p{L}]+"), lambda w: w != ""
    )
    base = docs.select(F.col(id_col), words.alias("words"))
    stats = base.select(
        id_col,
        F.size("words").alias("n_words"),
        F.coalesce(
            F.aggregate("words", F.lit(0), lambda a, w: a + F.length(w)),
            F.lit(0),
        ).alias("n_chars"),
    )

    uni = (
        base.select(F.col(id_col), F.explode("words").alias("w"))
        .groupBy(id_col, "w")
        .count()
    )
    topuni = uni.groupBy(id_col).agg(F.max("count").alias("uni_c"))

    def grams(n: int):
        return (
            base.where(F.size("words") >= n)
            .select(
                F.col(id_col),
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("words") - (n - 1)),
                        lambda i: F.concat_ws(
                            " ",
                            *[
                                F.element_at(F.col("words"), i + j)
                                for j in range(n)
                            ],
                        ),
                    )
                ).alias("g"),
            )
            .groupBy(id_col, "g")
            .count()
        )

    w_bi = Window.partitionBy(id_col).orderBy(F.desc("count"), F.asc("g"))
    topbi = (
        grams(2)
        .withColumn("rn", F.row_number().over(w_bi))
        .where(F.col("rn") == 1)
        .select(
            F.col(id_col),
            F.col("count").alias("bi_c"),
            F.col("g").alias("bi_g"),
        )
    )
    duptri = (
        grams(3)
        .where(F.col("count") > 1)
        .groupBy(id_col)
        .agg(
            F.sum(F.col("count") * (F.length("g") - 2)).alias("dup_chars")
        )
    )

    top_uni_frac = F.round(
        F.coalesce(F.col("uni_c"), F.lit(0))
        / F.greatest(F.col("n_words"), F.lit(1)),
        6,
    )
    top_bi_frac = F.round(
        F.coalesce(F.col("bi_c") * (F.length("bi_g") - 1), F.lit(0))
        / F.greatest(F.col("n_chars"), F.lit(1)),
        6,
    )
    dup_tri_frac = F.round(
        F.coalesce(F.col("dup_chars"), F.lit(0))
        / F.greatest(F.col("n_chars"), F.lit(1)),
        6,
    )
    out = (
        stats.join(topuni, id_col, "left")
        .join(topbi, id_col, "left")
        .join(duptri, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_words"),
            top_uni_frac.alias("top_unigram_frac"),
            top_bi_frac.alias("top_bigram_char_frac"),
            dup_tri_frac.alias("dup_trigram_char_frac"),
        )
    )
    keep = (
        (F.col("n_words") >= 20)
        & (F.col("top_unigram_frac") <= 0.12)
        & (F.col("top_bigram_char_frac") <= 0.12)
        & (F.col("dup_trigram_char_frac") <= 0.25)
    )
    return out.withColumn("keep", keep)


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                gram: int = 8) -> DataFrame:
    """Winnowing-style document fingerprint: the minimum md5 over all
    character 8-grams of the normalized text, plus the full-text digest.
    (id, digest, min_gram_hash). Robust to local edits the way a rolling-
    hash fingerprint is, while staying portable SQL."""
    from .dedup import normalized_text

    norm = normalized_text(F.col(text_col))
    pos = F.sequence(F.lit(1), F.greatest(F.length(norm) - gram + 1, F.lit(1)))
    grams = F.transform(pos, lambda i: F.md5(F.substring(norm, i, gram)))
    return docs.select(
        F.col(id_col),
        F.md5(norm).alias("digest"),
        F.array_min(grams).alias("min_gram_hash"),
    )
