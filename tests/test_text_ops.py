

# ------------------------------------------------------------------ URLs
def test_normalize_urls_cases(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from setsketch_ray.functions.text import normalize_urls

    cases = [
        # (input, expected url_norm, expected host)
        ("HTTPS://WWW.Example.COM:443/a/./b/../c?z=1&a=2#frag",
         "https://www.example.com/a/c?a=2&z=1", "www.example.com"),
        ("http://h.example.com:8080/x/",
         "http://h.example.com:8080/x/", "h.example.com"),
        # empty path -> "/"
        ("http://h2.example.com", "http://h2.example.com/",
         "h2.example.com"),
        # above-root .. collapses to root; duplicate keys keep order
        ("https://a.b.c/p/../../q?b=2&a=1&a=0",
         "https://a.b.c/q?a=1&a=0&b=2", "a.b.c"),
        # trailing dot segments
        ("ftp://F.example.com:21/file/./x/..", "ftp://f.example.com/file/",
         "f.example.com"),
        # non-default port for the OTHER scheme is kept
        ("http://h.example.com:443/", "http://h.example.com:443/",
         "h.example.com"),
        # empty query string drops the "?"
        ("http://h.example.com/p?", "http://h.example.com/p",
         "h.example.com"),
        # unparseable rows pass through with host=""
        ("not a url", "not a url", ""),
        ("", "", ""),
    ]
    ds = rd.from_arrow(pa.table({
        "url": pa.array([c[0] for c in cases], pa.string())}))
    out = {r["url"]: r for r in normalize_urls(ds).take_all()}
    for raw, want_norm, want_host in cases:
        assert out[raw]["url_norm"] == want_norm, raw
        assert out[raw]["host"] == want_host, raw


def test_normalize_urls_idempotent(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from setsketch_ray.functions.text import normalize_urls

    urls = [f"HTTP://H{i}.Example.com:80/a{i}/./b/../c?q={i}&a=1#z"
            for i in range(50)]
    ds = rd.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))
    once = [r["url_norm"] for r in
            normalize_urls(ds).take_all()]
    ds2 = rd.from_arrow(pa.table({"url": pa.array(once, pa.string())}))
    twice = [r["url_norm"] for r in normalize_urls(ds2).take_all()]
    assert once == twice


def test_html_to_text_cases(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from setsketch_ray.functions.text import html_to_text

    cases = [
        # head (incl. title) is NOT visible text; body tags strip
        ("<html><head><title>T1</title><meta x=1></head>"
         "<body><p>hello world</p></body></html>", "hello world", "T1"),
        # script/style/comments drop even inside body; entities decode
        ("<body>a &lt;b&gt; &amp;lt; c<script>if (1<2) x();</script>"
         "<style>q{}</style><!-- no -->&quot;d&#39;</body>",
         "a <b> &lt; c \"d'", ""),
        # whitespace collapse + trim
        ("<div>\n  spaced   <b>out</b>\n</div>", "spaced out", ""),
        # no body markup at all
        ("plain text", "plain text", ""),
    ]
    ds = rd.from_arrow(pa.table({
        "html": pa.array([c[0] for c in cases], pa.string())}))
    out = {r["html"]: r for r in html_to_text(ds).take_all()}
    for raw, want_text, want_title in cases:
        assert out[raw]["text_extracted"] == want_text, raw
        assert out[raw]["title"] == want_title, raw


# ------------------------------------------------------------ line dedup
def test_line_dedup_planted(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from setsketch_ray.functions.text import line_dedup

    boiler = "subscribe to our newsletter now for more great daily content here"
    uniq = [f"unique words only in document {i} appear here once total ok"
            for i in range(6)]
    # doc i = its unique line + the shared boilerplate line (+ a second
    # boilerplate copy in doc 0: within-doc dups of a cross-doc line drop
    # everywhere); doc 5 is boilerplate-only (rebuilds to '')
    texts = [f"{uniq[0]} {boiler} {boiler}",
             f"{uniq[1]} {boiler}",
             f"{boiler} {uniq[2]}",
             f"{uniq[3]} {uniq[3]}",  # within-doc dup only: NOT dropped
             uniq[4],
             boiler]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    out = {r["doc_id"]: r
           for r in line_dedup(ds, words_per_line=11).take_all()}
    assert out[0] == {"doc_id": 0, "n_lines": 3, "n_dropped": 2,
                      "text_dedup": uniq[0]}
    assert out[1]["text_dedup"] == uniq[1]
    assert out[2]["text_dedup"] == uniq[2]
    assert out[3] == {"doc_id": 3, "n_lines": 2, "n_dropped": 0,
                      "text_dedup": f"{uniq[3]} {uniq[3]}"}
    assert out[4]["text_dedup"] == uniq[4]
    assert out[5] == {"doc_id": 5, "n_lines": 1, "n_dropped": 1,
                      "text_dedup": ""}


def test_line_dedup_short_tail_lines(ray_session):
    """Docs whose word count is not a multiple of words_per_line: the tail
    window is shorter and only matches an identical short tail."""
    import pyarrow as pa
    import ray.data as rd

    from setsketch_ray.functions.text import line_dedup

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a b c d e", "a b c d e", "a b c"], pa.string())}))
    out = {r["doc_id"]: r for r in line_dedup(ds, words_per_line=3).take_all()}
    # lines: doc1/doc2 = ['a b c', 'd e'], doc3 = ['a b c']
    assert out[1] == {"doc_id": 1, "n_lines": 2, "n_dropped": 2,
                      "text_dedup": ""}
    assert out[2]["text_dedup"] == ""
    assert out[3] == {"doc_id": 3, "n_lines": 1, "n_dropped": 1,
                      "text_dedup": ""}


# ----------------------------------------------------------- co-occurrence
def test_word_cooccurrence_bruteforce(ray_session):
    """word_cooccurrence == brute-force distinct-doc pair counts; repeats
    within a doc count once; block layout independent."""
    import itertools

    import pyarrow as pa
    import ray.data as rd

    from setsketch_ray.functions.text import word_cooccurrence

    docs = ["a b c a b", "b c d", "a d d d", "e e e", "a b", "c a b"]
    want = {}
    for d in docs:
        ws = sorted(set(d.split()))
        for x, y in itertools.combinations(ws, 2):
            want[(x, y)] = want.get((x, y), 0) + 1
    want_rows = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
    for blocks in (1, 3):
        ds = rd.from_arrow(pa.table({"text": pa.array(docs)})) \
            .repartition(blocks)
        got = word_cooccurrence(ds, "text", vocab_size=64, k=100)
        rows = list(zip(got["word_a"].to_pylist(),
                        got["word_b"].to_pylist(),
                        got["n_docs"].to_pylist()))
        assert rows == [(a, b, c) for (a, b), c in want_rows]

    # vocab restriction: vocab_size=2 keeps only the 2 most frequent words
    got2 = word_cooccurrence(
        rd.from_arrow(pa.table({"text": pa.array(docs)})),
        "text", vocab_size=2, k=100)
    assert got2.num_rows == 1  # only one pair possible within a 2-word vocab


def test_line_dedup_head_broadcast_partition_identical(ray_session):
    """head_broadcast=True (hot-line skew mitigation) produces output
    identical to the plain line-exchange path, including with a universal
    boilerplate line carried by EVERY doc and a head_k small enough that
    real duplicated lines remain in the tail."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from setsketch_ray.functions.text import line_dedup

    rng = np.random.default_rng(41)
    boiler = " ".join(f"b{i}" for i in range(10))        # universal line
    shared = [" ".join(f"s{k}w{i}" for i in range(10)) for k in range(6)]
    texts = []
    for d in range(80):
        parts = [boiler]
        parts.append(" ".join(
            f"u{d}x{i}" for i in range(10)))             # unique line
        if d % 3 == 0:
            parts.append(shared[d % len(shared)])        # tail dup lines
        rng.shuffle(parts)
        texts.append(" ".join(parts))
    ds_t = pa.table({"doc_id": pa.array(range(80), pa.int64()),
                     "text": pa.array(texts)})

    def run(**kw):
        out = line_dedup(rd.from_arrow(ds_t).repartition(5), **kw)
        return sorted((r["doc_id"], r["n_lines"], r["n_dropped"],
                       r["text_dedup"]) for r in out.take_all())

    plain = run()
    # head_k=3: the boilerplate + at most 2 shared lines go head; the
    # remaining shared lines exercise the tail exchange
    headed = run(head_broadcast=True, head_k=3)
    assert headed == plain
    # sanity: the universal line was actually dropped everywhere
    assert all("b0" not in row[3] for row in plain)
    # full-head variant (everything fits the head) also identical
    assert run(head_broadcast=True, head_k=10_000) == plain


def test_word_topk_by_group_exact_and_ties(ray_session):
    import ray.data as rd

    from setsketch_ray.functions.text import word_topk_by_group

    rows = [
        {"g": "en", "t": "a a a b b c"},
        {"g": "en", "t": "b c d"},
        {"g": "fr", "t": "x"},          # fewer words than k
        {"g": "de", "t": "p q p q"},    # tie -> word ascending
    ]
    out = word_topk_by_group(rd.from_items(rows), "t", "g", k=2,
                             num_partitions=8)
    got = list(zip(out["g"].to_pylist(), out["word"].to_pylist(),
                   out["cnt"].to_pylist()))
    assert got == [("de", "p", 2), ("de", "q", 2),
                   ("en", "a", 3), ("en", "b", 3),
                   ("fr", "x", 1)]
