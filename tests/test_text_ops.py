

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
