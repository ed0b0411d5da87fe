"""snippet_slices parity: the Spark operator vs a direct Python port of
the reference algorithm (src/lex.rs:537-607 compute_snippet_slices +
build_snippets:433-442) over handcrafted multi-occurrence texts that
exercise sentence snapping, merging, and the max_snippets cap."""

from memvid_spark.operators.ask import snippet_slices


def _sentence_start_before(content: str, idx: int):
    if idx == 0:
        return 0
    candidate = None
    for pos, ch in enumerate(content[:idx]):
        if ch in ".!?\n":
            candidate = pos + 1
    if candidate is None:
        return None
    pos = candidate
    while pos < len(content) and content[pos] in " \t\n\r\x0b\x0c":
        pos += 1
    return pos


def _sentence_end_after(content: str, idx: int):
    if idx >= len(content):
        return len(content)
    for off, ch in enumerate(content[idx:]):
        g = idx + off
        if ch in ".!?":
            return g + 1
        if ch == "\n":
            return g
    return None


def compute_snippet_slices(content, occurrences, window, max_snippets):
    """Line-by-line port of lex.rs:537-607 (occurrences must be sorted)."""
    if not content:
        return []
    merged = []
    for start, end in occurrences:
        s = max(start - window // 2, 0)
        e = min(end + window // 2, len(content))
        adj = _sentence_start_before(content, s)
        if adj is not None:
            s = adj
        adj = _sentence_end_after(content, e)
        if adj is not None:
            e = adj
        if e <= s:
            continue
        if merged and s <= merged[-1][1] + 20:
            merged[-1][1] = max(merged[-1][1], e)
            continue
        merged.append([min(s, len(content)), min(e, len(content))])
        if len(merged) >= max_snippets:
            break
    return [tuple(m) for m in merged]


def _occurrences(text: str, phrase: str):
    out, i = [], 0
    low, ph = text.lower(), phrase.lower()
    while True:
        j = low.find(ph, i)
        if j == -1:
            return out
        out.append((j, j + len(phrase)))
        i = j + len(phrase)


CASES = [
    # dense repeats -> merge into one slice
    ("alpha beta alpha gamma alpha", "alpha", 160, 3),
    # sentences force snapping; far-apart occurrences -> separate slices
    (
        "the cat sat. " + "x" * 200 + ". the cat ran! " + "y" * 200 + "? the cat hid.",
        "cat",
        40,
        3,
    ),
    # newline boundaries on both sides
    ("first line cat here\nsecond cat line\nthird cat tail", "cat", 10, 3),
    # cap: more islands than max_snippets, creator-only last island
    (
        ". ".join(f"s{i} cat {'z' * 60}" for i in range(8)),
        "cat",
        20,
        3,
    ),
    # occurrence at very start and very end
    ("cat starts here and at the end comes another cat", "cat", 12, 2),
    # window larger than doc
    ("tiny cat doc", "cat", 500, 3),
]


def test_matches_reference_port(spark):
    rows = [(i, t) for i, (t, _, _, _) in enumerate(CASES)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for i, (text, phrase, window, maxn) in enumerate(CASES):
        got = (
            snippet_slices(
                docs.filter(f"doc_id = {i}"), phrase, window=window, max_snippets=maxn
            )
            .orderBy("slice_rank")
            .collect()
        )
        want = compute_snippet_slices(text, _occurrences(text, phrase), window, maxn)
        assert len(got) == len(want), (i, got, want)
        for r, (s, e) in zip(got, want):
            assert r.snippet_start == s, (i, r, s, e)
            assert r.snippet == text[s:e].replace("\n", " "), (i, r, s, e)
        assert [r.slice_rank for r in got] == list(range(1, len(want) + 1))


def test_no_occurrence_docs_omitted(spark):
    docs = spark.createDataFrame(
        [(1, "nothing to see"), (2, "a cat appears")], "doc_id long, text string"
    )
    out = snippet_slices(docs, "cat").collect()
    assert {r.doc_id for r in out} == {2}


def test_randomized_batch_parity(spark):
    """Randomized texts (seeded) in one batch DataFrame vs the Python
    port — broad coverage beyond the handcrafted edges."""
    import random

    rng = random.Random(99)
    words = ["cat", "dog", "xx", "yyy", "..", "!", "?", "\n"]
    cases = []
    for i in range(40):
        n = rng.randint(1, 60)
        text = "".join(
            rng.choice(words) + (" " if rng.random() < 0.7 else "")
            for _ in range(n)
        )
        window = rng.choice([8, 20, 60, 160])
        maxn = rng.choice([1, 2, 3])
        cases.append((i, text, window, maxn))

    docs = spark.createDataFrame(
        [(i, t) for i, t, _, _ in cases], "doc_id long, text string"
    )
    by_params = {}
    for i, text, window, maxn in cases:
        by_params.setdefault((window, maxn), []).append((i, text))
    for (window, maxn), items in by_params.items():
        ids = [i for i, _ in items]
        got_rows = (
            snippet_slices(
                docs.filter(docs.doc_id.isin(ids)), "cat",
                window=window, max_snippets=maxn,
            )
            .orderBy("doc_id", "slice_rank")
            .collect()
        )
        got = {}
        for r in got_rows:
            got.setdefault(r.doc_id, []).append((r.snippet_start, r.snippet))
        for i, text in items:
            want = [
                (s, text[s:e].replace("\n", " "))
                for s, e in compute_snippet_slices(
                    text, _occurrences(text, "cat"), window, maxn
                )
            ]
            assert got.get(i, []) == want, (i, window, maxn, text)
