"""Deterministic Common-Crawl-style `pages` corpus + pinned text extraction.

Schema per BASELINE.json input_hint:
    pages(url string, warc_ts timestamp, html binary, text string, lang string)

Everything is derived from (seed=42, doc_id) through a counter-based
splitmix64 mixer, so generation is **partition-independent**: the same
doc_id produces the same bytes no matter how Spark partitions the range.
That is what makes the corpus usable at any scale and what makes resume
tests meaningful.

``extract_text`` is the pinned pure extraction function (the per-row
invariant: engine extraction of `html` must equal the `text` column
byte-for-byte per url). The generator *constructs* html around the
ground-truth text, and the invariant is enforced in tests and in the
build pipeline's extraction UDF.
"""

from __future__ import annotations

import re
from datetime import datetime, timezone

import numpy as np
import pandas as pd

SEED = 42
VOCAB_SIZE = 10_000
ZIPF_S = 1.07
_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

# ---------------------------------------------------------------- mixer ---

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Counter-based deterministic 64-bit mixer (splitmix64 finalizer)."""
    z = (x + _GOLDEN).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _mix(doc_ids: np.ndarray, stream: int) -> np.ndarray:
    k = np.uint64((SEED * 0x9E3779B97F4A7C15 + stream) & 0xFFFFFFFFFFFFFFFF)
    return _splitmix64(doc_ids.astype(np.uint64) ^ _splitmix64(np.full_like(doc_ids, k, dtype=np.uint64)))


def _uniform(doc_ids: np.ndarray, stream: int) -> np.ndarray:
    return _mix(doc_ids, stream).astype(np.float64) / 2.0**64


# ---------------------------------------------------------------- vocab ---

_SYLLABLES = [
    "al", "an", "ar", "as", "at", "ba", "be", "bi", "bo", "ca", "ce", "co",
    "da", "de", "di", "do", "du", "el", "en", "er", "es", "fa", "fi", "ga",
    "go", "ha", "he", "in", "is", "ka", "la", "le", "li", "lo", "ma", "me",
    "mi", "mo", "na", "ne", "ni", "no", "or", "pa", "pe", "po", "ra", "re",
    "ri", "ro", "sa", "se", "si", "so", "ta", "te", "ti", "to", "tu", "ul",
    "um", "un", "ur", "va", "ve", "vi", "vo", "za", "ze", "zo",
]
_HEAD_WORDS = [
    "the", "of", "and", "to", "in", "a", "is", "that", "for", "it", "as",
    "was", "with", "be", "by", "on", "not", "he", "this", "are", "or", "his",
    "from", "at", "which", "but", "have", "an", "had", "they", "you", "were",
    "their", "one", "all", "we", "can", "her", "has", "there",
]
_CS_WORDS = ["žluťoučký", "kůň", "úpěl", "ďábelské", "ódy", "příliš", "dům"]
_DE_WORDS = ["über", "größe", "straße", "müde", "schön"]


def build_vocab() -> list[str]:
    """Deterministic ~10k-word vocabulary; index 0 is the head of the Zipf
    distribution ("the"-like terms hit nearly every doc → exercises the
    head-term skew path)."""
    vocab = list(_HEAD_WORDS) + list(_CS_WORDS) + list(_DE_WORDS)
    i = 0
    while len(vocab) < VOCAB_SIZE:
        h = int(_splitmix64(np.array([i], dtype=np.uint64))[0])
        n_syl = 2 + h % 3
        w = "".join(
            _SYLLABLES[(h >> (8 * (j + 1))) % len(_SYLLABLES)] for j in range(n_syl)
        )
        if w not in _HEAD_WORDS:
            vocab.append(w)
        i += 1
    return vocab[:VOCAB_SIZE]


def zipf_cdf(size: int = VOCAB_SIZE, s: float = ZIPF_S) -> np.ndarray:
    ranks = np.arange(1, size + 1, dtype=np.float64)
    w = ranks**-s
    return np.cumsum(w) / w.sum()


_VOCAB: list[str] | None = None
_CDF: np.ndarray | None = None


def _tables() -> tuple[np.ndarray, np.ndarray]:
    global _VOCAB, _CDF
    if _VOCAB is None:
        _VOCAB = build_vocab()
        _CDF = zipf_cdf()
    return np.asarray(_VOCAB, dtype=object), _CDF


# ------------------------------------------------------------ extraction ---

_NAV_RE = re.compile(r"<nav>.*?</nav>", re.DOTALL)
_SCRIPT_RE = re.compile(r"<script>.*?</script>", re.DOTALL)
_TITLE_RE = re.compile(r"<title>(.*?)</title>", re.DOTALL)
_P_RE = re.compile(r"<p>(.*?)</p>", re.DOTALL)


def extract_text(html: bytes) -> str:
    """Pinned extraction: drop <nav>/<script> subtrees, then title + every
    <p> body, newline-joined. This single definition is reused by the
    engine's extraction UDF and by the oracle — byte-identical contract."""
    s = html.decode("utf-8")
    s = _NAV_RE.sub("", s)
    s = _SCRIPT_RE.sub("", s)
    title = _TITLE_RE.search(s)
    parts = [title.group(1)] if title else []
    parts.extend(_P_RE.findall(s))
    return "\n".join(parts)


# ------------------------------------------------------------- generator ---

_SENT_SEPS = np.asarray([". ", "? ", "! ", "; ", ": ", ", "], dtype=object)
# weighted toward '.', includes stop chars ':' '.' and ignore char ','
_SEP_WEIGHTS = np.array([0.45, 0.1, 0.1, 0.1, 0.1, 0.15])
_SEP_CDF = np.cumsum(_SEP_WEIGHTS) / _SEP_WEIGHTS.sum()

_BOILER = (
    "<nav><p>home about contact sitemap</p></nav>"
    "<script>var t=1;function f(){return t}</script>"
)


def generate_pages_batch(doc_ids: np.ndarray) -> pd.DataFrame:
    """Vectorized batch generator: doc_ids → pages rows (deterministic)."""
    vocab, cdf = _tables()
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    n = len(doc_ids)
    if n == 0:
        return pd.DataFrame(
            {"doc_id": [], "url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
        )

    # doc lengths: log-normal, median ~200 tokens, capped at 5000
    u_len = _uniform(doc_ids, 1)
    z = np.sqrt(2.0) * _erfinv_vec(2 * u_len - 1)
    doclen = np.clip(np.exp(np.log(200.0) + 0.6 * z), 5, 5000).astype(np.int64)

    # language mix: en 90% / cs 8% / de 2%
    u_lang = _uniform(doc_ids, 2)
    lang = np.where(u_lang < 0.90, "en", np.where(u_lang < 0.98, "cs", "de"))

    # sites Zipf-ish: site = floor(1000 * u^3) → head sites dominate
    u_site = _uniform(doc_ids, 3)
    site = (1000 * u_site**3).astype(np.int64)

    # flattened token sampling: counter = doc_id * 2^20 + position
    offsets = np.concatenate(([0], np.cumsum(doclen)))
    total = int(offsets[-1])
    flat_doc = np.repeat(doc_ids, doclen)
    flat_pos = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], doclen)
    ctr = (flat_doc.astype(np.uint64) << np.uint64(20)) | flat_pos.astype(np.uint64)
    u_tok = _splitmix64(ctr ^ np.uint64(SEED * 7919)).astype(np.float64) / 2.0**64
    tok_idx = np.searchsorted(cdf, u_tok, side="left")

    # diacritic words sprinkled into cs/de docs (3% of tokens)
    lang_flat = np.repeat(lang, doclen)
    u_dia = _splitmix64(ctr ^ np.uint64(SEED * 104729)).astype(np.float64) / 2.0**64
    cs_mask = (lang_flat == "cs") & (u_dia < 0.03)
    de_mask = (lang_flat == "de") & (u_dia < 0.03)
    cs_base = len(_HEAD_WORDS)
    tok_idx[cs_mask] = cs_base + (_mix(ctr[cs_mask], 5) % np.uint64(len(_CS_WORDS))).astype(np.int64)
    tok_idx[de_mask] = cs_base + len(_CS_WORDS) + (
        _mix(ctr[de_mask], 6) % np.uint64(len(_DE_WORDS))
    ).astype(np.int64)

    words = vocab[tok_idx]

    # sentence boundaries: sentence length 6 + mix%9 tokens; separator after
    sent_len = 6 + (_mix(ctr, 8) % np.uint64(9)).astype(np.int64)
    # a token ends its sentence when its position-in-doc modulo a per-token
    # draw says so — approximate but deterministic: mark every token whose
    # (pos % sent_len)==sent_len-1
    is_sent_end = (flat_pos % sent_len) == (sent_len - 1)
    sep_idx = np.searchsorted(
        _SEP_CDF, _mix(ctr, 9).astype(np.float64) / 2.0**64, side="left"
    )
    # occasional stray '"' ignore-token (0.5%)
    u_q = _mix(ctr, 10).astype(np.float64) / 2.0**64
    quoted = u_q < 0.005
    words = np.where(quoted, '"', words)

    seps = np.where(is_sent_end, _SENT_SEPS[sep_idx], " ").astype(object)
    pieces = np.char.add(words.astype("U32"), seps.astype("U4"))

    # paragraphs: ~60 tokens each
    texts: list[str] = []
    htmls: list[bytes] = []
    urls: list[str] = []
    u_boiler = _uniform(doc_ids, 11)
    for k in range(n):
        lo, hi = int(offsets[k]), int(offsets[k + 1])
        body = pieces[lo:hi]
        paras = ["".join(body[j : j + 60]).rstrip() for j in range(0, len(body), 60)]
        title_words = " ".join(words[lo : min(lo + 5, hi)])
        text = "\n".join([title_words] + paras)
        p_html = "".join(f"<p>{p}</p>" for p in paras)
        boiler = _BOILER if u_boiler[k] < 0.10 else ""
        html = (
            f"<html><head><title>{title_words}</title></head>"
            f"<body>{boiler}{p_html}</body></html>"
        ).encode("utf-8")
        htmls.append(html)
        texts.append(text)
        urls.append(f"https://example-{site[k]:04d}.test/page/{doc_ids[k]:06d}")

    ts = pd.to_datetime(
        (np.datetime64(_EPOCH.replace(tzinfo=None)) +
         (_mix(doc_ids, 12) % np.uint64(86400 * 365)).astype("timedelta64[s]"))
    )
    return pd.DataFrame(
        {
            "doc_id": doc_ids,
            "url": urls,
            "warc_ts": ts,
            "html": htmls,
            "text": texts,
            "lang": lang,
        }
    )


def _erfinv_vec(y: np.ndarray) -> np.ndarray:
    """Vectorized inverse error function (Winitzki approximation) — good to
    ~1e-3, plenty for synthetic doc-length shaping; avoids scipy."""
    a = 0.147
    ln1my2 = np.log(np.clip(1 - y * y, 1e-300, None))
    term = 2 / (np.pi * a) + ln1my2 / 2
    return np.sign(y) * np.sqrt(np.sqrt(term**2 - ln1my2 / a) - term)


PAGES_SCHEMA = (
    "doc_id long, url string, warc_ts timestamp, html binary, text string, lang string"
)


def pages_df(spark, n_docs: int, partitions: int | None = None):
    """Distributed deterministic corpus: spark.range → mapInPandas batch
    generator. Partition-count-independent output (counter-based RNG)."""
    from .session import ship_package

    ship_package(spark)
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            yield generate_pages_batch(pdf["id"].to_numpy())

    return (
        spark.range(0, n_docs, numPartitions=parts)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )
