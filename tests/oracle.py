"""Single-process pure-Python oracle for the KG pipeline.

Independent reimplementation of the corpus spec + extraction spec +
linking semantics (FIXTURES.md) — shares NO code with arachne_spark
beyond the declarative FACTS/alias tables.  The engine is compared
against this oracle for:
  * byte-identical extracted text per url
  * triple P/R >= 0.95

Uses plain dicts/lists and a union-find — deliberately a different
algorithmic family than the engine's DataFrame large-star/small-star.
"""

from __future__ import annotations

import hashlib
import re

from arachne_spark.sources.dictionary import (
    FACTS,
    _PREDICATES,
    alias_rows,
)

N_FILLER = 80
SENTENCES = [f"{s} {p} {o}." for s, p, o in FACTS]
UPDATE_SENTENCE = "updated content about sewing."
MISSPELL_SENTENCE = "notes regarding velazques and pheidipides."
MISSPELL_EVERY = 13
MAX_ALIAS_TOKENS = 4
MAX_GAP = 3

# fuzzy-link constants (must mirror arachne_spark.operators.lsh_link)
K_SHINGLE = 3
N_HASHES = 8
N_BANDS = 2
FUZZY_MIN_LEN = 6
FUZZY_THRESHOLD = 0.5


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def char_shingles(s: str) -> frozenset:
    if len(s) >= K_SHINGLE:
        return frozenset(
            s[i : i + K_SHINGLE] for i in range(len(s) - K_SHINGLE + 1)
        )
    return frozenset([s])


def lsh_bands(s: str) -> list[str]:
    sh = char_shingles(s)
    mins = [
        min(_md5(f"{p}:{x}") for x in sh) for p in range(N_HASHES)
    ]
    rows = N_HASHES // N_BANDS
    return [
        _md5("".join(mins[j * rows : (j + 1) * rows]))
        for j in range(N_BANDS)
    ]


def _fuzzy_dict():
    """[(alias, qid, prio, bands, shingles)] for item-kind aliases."""
    out = []
    for alias, qid, kind, prio in alias_rows():
        if kind == "item":
            out.append(
                (alias, qid, prio, lsh_bands(alias), char_shingles(alias))
            )
    return out


def fuzzy_link(surface: str, fdict) -> str | None:
    """Best item QID for a surface form, or None: LSH band collision
    gates candidacy; rounded exact Jaccard >= threshold gates the link;
    winner by (-jaccard, priority, qid)."""
    sb, ssh = lsh_bands(surface), char_shingles(surface)
    best = None
    for alias, qid, prio, ab, ash in fdict:
        if not any(x == y for x, y in zip(sb, ab)):
            continue
        inter = len(ssh & ash)
        j = round(inter / (len(ssh) + len(ash) - inter), 4)
        if j < FUZZY_THRESHOLD:
            continue
        key = (-j, prio, qid)
        if best is None or key < best[0]:
            best = (key, qid)
    return best[1] if best else None


def filler(uid: int) -> str:
    out = f"this page talks about entity{uid * 7 % N_FILLER}"
    if uid % 2 == 0:
        out += " and a human"
    if uid % 5 == 0:
        out += " in the united states"
    return out


def page_paragraphs(uid: int, snapshot: int) -> list[str]:
    ps = [SENTENCES[(uid + j) % len(SENTENCES)] for j in range(3)]
    ps.append(filler(uid))
    if uid % MISSPELL_EVERY == 3:
        ps.append(MISSPELL_SENTENCE)
    if snapshot > 0:
        ps.append(UPDATE_SENTENCE)
    return ps


def page_html(uid: int, snapshot: int) -> bytes:
    title = f"page {uid}"
    body = "".join(f"<p>{p}</p>" for p in page_paragraphs(uid, snapshot))
    return (
        f"<html><head><title>{title}</title>"
        f"<script>var x = 1 < 2;</script></head>"
        f"<body><h1>{title}</h1>{body}</body></html>"
    ).encode()


def page_text(uid: int, snapshot: int) -> str:
    title = f"page {uid}"
    return "\n".join([title, title] + page_paragraphs(uid, snapshot))


def extract_text(html: bytes) -> str:
    s = html.decode("utf-8", errors="replace")
    s = re.sub(
        r"<(script|style)\b[^>]*>.*?</\1\s*>", "\n", s,
        flags=re.IGNORECASE | re.DOTALL,
    )
    s = re.sub(r"<!--.*?-->", "\n", s, flags=re.DOTALL)
    s = re.sub(r"<[^>]*>", "\n", s)
    for ent, ch in [
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
    ]:
        s = s.replace(ent, ch)
    s = re.sub(r"[ \t]+", " ", s)
    s = re.sub(r" ?\n ?", "\n", s)
    s = re.sub(r"\n+", "\n", s)
    return s.strip()


def tokenize(text: str) -> list[str]:
    return re.findall(r"[a-z0-9]+|\.", text.lower())


def detect_mentions(tokens: list[str], alias_map: dict):
    """[(pos, n, qid)] with priority resolution + longest-match dominance."""
    raw = []
    for n in range(1, MAX_ALIAS_TOKENS + 1):
        for i in range(len(tokens) - n + 1):
            ngram = " ".join(tokens[i : i + n])
            if ngram in alias_map:
                raw.append((i, n, alias_map[ngram]))
    out = []
    for pos, n, qid in raw:
        dominated = any(
            p2 <= pos and p2 + n2 >= pos + n and n2 > n
            for p2, n2, _ in raw
        )
        if not dominated:
            out.append((pos, n, qid))
    return out


def expected_output(n_pages: int, recrawl_every: int = 10):
    """→ (texts: {url: text}, triples: set[(s,p,o)]) after canonicalization."""
    alias_map = {}
    for alias, qid, _kind, prio in alias_rows():
        if alias not in alias_map or (prio, qid) < alias_map[alias][1:]:
            alias_map[alias] = (qid, prio, qid)
    alias_map = {a: v[0] for a, v in alias_map.items()}
    pred_map = dict(_PREDICATES)

    fdict = _fuzzy_dict()
    fuzzy_memo: dict[str, str | None] = {}

    texts, triples = {}, set()
    same_as = []
    for uid in range(n_pages):
        if uid % 11 == 7:  # lang filter: 'de' rows are dropped
            continue
        snapshot = 1 if uid % recrawl_every == 0 else 0  # latest snapshot
        url = f"https://example.org/p/{uid}"
        text = page_text(uid, snapshot)
        texts[url] = text
        tokens = tokenize(text)
        mentions = detect_mentions(tokens, alias_map)
        for pos, n, qid in mentions:
            triples.add((url, "mentions", qid))
        # long-tail fuzzy links on uncovered tokens
        covered = {
            i for pos, n, _ in mentions for i in range(pos, pos + n)
        }
        for i, tok in enumerate(tokens):
            if len(tok) < FUZZY_MIN_LEN or i in covered:
                continue
            if tok not in fuzzy_memo:
                fuzzy_memo[tok] = fuzzy_link(tok, fdict)
            if fuzzy_memo[tok]:
                triples.add((url, "mentions", fuzzy_memo[tok]))
        for p1, n1, q1 in mentions:
            for p2, _n2, q2 in mentions:
                gap = p2 - (p1 + n1)
                if 1 <= gap <= MAX_GAP:
                    phrase = " ".join(tokens[p1 + n1 : p2])
                    pred = pred_map.get(phrase)
                    if pred == "sameAs":
                        same_as.append((q1, q2))
                    elif pred:
                        triples.add((q1, pred, q2))

    # canonicalization: union-find with min-(numeric, qid) representative
    parent: dict[str, str] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra == rb:
            return
        key = lambda q: (int(q[1:]), q)  # noqa: E731
        keep, drop = (ra, rb) if key(ra) < key(rb) else (rb, ra)
        parent[drop] = keep

    for a, b in same_as:
        union(a, b)

    canon = lambda q: find(q) if q in parent else q  # noqa: E731
    return texts, {
        (canon(s) if p != "mentions" else s, p, canon(o))
        for s, p, o in triples
    }


def precision_recall(
    got: set, want: set
) -> tuple[float, float]:
    if not got or not want:
        return float(not want and not got), float(not want and not got)
    tp = len(got & want)
    return tp / len(got), tp / len(want)
