"""Deterministic synthetic fixtures (FIXTURES.md; seed=42, order-stable).

Mirrors the reference's golden-test strategy (fst_unittest.cpp: sorted
word dictionary -> fuzzy("hair", k=2) -> exact golden hit set): fixture
generation computes expected answers with the trusted pure-Python DP
oracles at generation time.
"""

from __future__ import annotations

import datetime as dt
import random
import string

from ..functions.distance import levenshtein, osa

SEED = 42

_SYLLABLES = [
    "ha", "he", "hi", "ho", "ra", "re", "ri", "ro", "la", "le", "li", "lo",
    "ca", "ce", "ci", "co", "ta", "te", "ti", "to", "na", "ne", "ni", "no",
    "sa", "se", "si", "so", "ma", "me", "mi", "mo", "pa", "pe", "pi", "po",
    "ir", "er", "ar", "or", "in", "en", "an", "on", "st", "tr", "ch", "sh",
]


def gen_dict_words(n: int = 5000, seed: int = SEED) -> list[str]:
    """Seeded English-like word dictionary (stand-in for the 82,157-word
    fst_test_dict2.txt): syllable compounds give realistic shared
    prefixes and dense edit-distance neighborhoods around short words."""
    rng = random.Random(seed)
    words = {"hair", "hare", "air", "hairs", "chair", "chairs", "haird"}
    while len(words) < n:
        w = "".join(rng.choice(_SYLLABLES) for _ in range(rng.randint(1, 4)))
        if rng.random() < 0.3:
            w += rng.choice(string.ascii_lowercase)
        if 2 <= len(w) <= 16:
            words.add(w)
    return sorted(words)


def fuzzy_golden(
    words: list[str], query: str, k: int, damerau: bool
) -> list[str]:
    """Trusted DP oracle golden: matching words in lexicographic order."""
    fn = osa if damerau else levenshtein
    return sorted(w for w in words if fn(query, w) <= k)


def gen_dict_kv(seed: int = SEED) -> list[tuple[str, int]]:
    """Map-mode dictionary with CJK keys and the README demo pattern
    (README.md:35-45) plus seeded ASCII keys; duplicate keys present so
    dedup policy is exercised.  Returns (key, value) rows (unsorted)."""
    rng = random.Random(seed)
    rows: list[tuple[str, int]] = [
        ("中国", 1), ("中国人", 2), ("北京", 3), ("北京大学", 4),
        ("日本", 5), ("東京", 6), ("中国", 9),  # duplicate key -> dedup
    ]
    words = gen_dict_words(500, seed=seed + 1)
    for w in words:
        rows.append((w, rng.randint(0, 2**40)))
    rng.shuffle(rows)
    return rows


def gen_sort_lines(seed: int = SEED, n: int = 243) -> list[str]:
    """Sort-policy fixture (mirrors large_file_sort_test1_input.txt, 243
    lines): raw lines with leading/trailing spaces, blanks, and dups.
    Sort key is the trimmed line; raw line is what gets emitted
    (large_file_sorter.cpp:229-241)."""
    rng = random.Random(seed)
    lines: list[str] = []
    words = gen_dict_words(80, seed=seed + 2)
    for _ in range(n):
        r = rng.random()
        if r < 0.12:
            lines.append(" " * rng.randint(0, 3))  # blank / whitespace-only
        else:
            w = rng.choice(words)
            lines.append(" " * rng.randint(0, 2) + w + " " * rng.randint(0, 2))
    return lines


_HOST_WORDS = [
    "news", "shop", "blog", "wiki", "mail", "data", "code", "docs", "maps",
    "site", "home", "info", "web", "portal", "forum", "cloud", "store",
]
_TLDS = ["com", "org", "net", "io", "de", "fr"]
_TITLE_WORDS = [
    "breaking", "review", "guide", "intro", "deep", "dive", "spark", "query",
    "engine", "fuzzy", "search", "index", "scale", "daily", "weekly", "report",
    "update", "notes", "letter", "story", "world", "local", "tech", "science",
]


def _typo(rng: random.Random, s: str, n_edits: int) -> str:
    """Apply n_edits random character edits (ins/del/sub/transpose)."""
    chars = list(s)
    for _ in range(n_edits):
        op = rng.choice(["ins", "del", "sub", "swap"])
        if op == "ins" or not chars:
            i = rng.randint(0, len(chars))
            chars.insert(i, rng.choice(string.ascii_lowercase))
        elif op == "del":
            chars.pop(rng.randrange(len(chars)))
        elif op == "sub":
            i = rng.randrange(len(chars))
            chars[i] = rng.choice(string.ascii_lowercase)
        else:
            if len(chars) >= 2:
                i = rng.randrange(len(chars) - 1)
                chars[i], chars[i + 1] = chars[i + 1], chars[i]
    return "".join(chars)


def gen_pages(
    n_clusters: int = 400,
    dup_rate: float = 0.6,
    max_dups: int = 3,
    seed: int = SEED,
):
    """Common-Crawl-style pages with planted duplicate clusters
    (BASELINE.json input_hint schema).  Returns (pages_rows, truth_rows):

    pages_rows: (url, warc_ts, html, text, lang)
    truth_rows: (url, cluster_id)

    Hosts are Zipf-skewed (realistic blocking skew).  Duplicate variants
    perturb the *title path segment* by <= 2 char edits (covering
    insert/delete/substitute/transpose), so normalized host+title keys of
    one cluster stay within OSA distance 2 — the blocking invariant the
    pipeline must exploit.  ``text`` is unique per url and must pass
    through the pipeline byte-identical."""
    from ..functions.distance import batch_levenshtein as _batch

    rng = random.Random(seed)
    # Zipf-ish host pool: host i has weight ~ 1/(i+1)
    hosts = [
        f"{rng.choice(_HOST_WORDS)}{i}.{rng.choice(_TLDS)}" for i in range(60)
    ]
    weights = [1.0 / (i + 1) for i in range(len(hosts))]
    pages = []
    truth = []
    epoch = dt.datetime(2024, 1, 1)
    base_keys: list[str] = []  # normalized host/title keys of accepted clusters
    for cid in range(n_clusters):
        # sample a base key well-separated (OSA > 6) from every accepted
        # base key: variants are <=2 edits from their base, so variants of
        # different clusters stay > 2 apart (triangle inequality)
        while True:
            host = rng.choices(hosts, weights=weights, k=1)[0]
            title = "-".join(
                rng.sample(_TITLE_WORDS, rng.randint(2, 4))
            ) + f"-{rng.randint(1, 999)}"
            key = f"{host}/{title}"
            if not base_keys:
                break
            d = _batch([key] * len(base_keys), base_keys, clamp=6, transpositions=True)
            if int(d.min()) > 6:
                break
        base_keys.append(key)
        n_var = 1 + (rng.randint(1, max_dups) if rng.random() < dup_rate else 0)
        seen = set()
        for v in range(n_var):
            t = title if v == 0 else _typo(rng, title, rng.randint(1, 2))
            if t in seen:  # identical variant would collapse two urls
                t = title + f"x{v}"
            seen.add(t)
            url = f"https://{host}/{t}?cid={cid}&v={v}"
            ts = epoch + dt.timedelta(seconds=cid * 1000 + v)
            text = f"body of {title} variant {v} cluster {cid} :: " + " ".join(
                rng.choices(_TITLE_WORDS, k=20)
            )
            html = f"<html><title>{t}</title></html>".encode()
            pages.append((url, ts, html, text, "en"))
            truth.append((url, cid))
    return pages, truth
