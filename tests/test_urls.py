"""Unit tests for the URL canonicalizer (C6) and domain grouping (C16).

Case matrix mirrors the Heritrix rule chain semantics studied at
crawler-beans.cxml:555-570 and common.smk:17-36.
"""

from bitextor_spark.functions.urls import (
    canonicalize_url,
    host_of,
    max_segment_repetitions,
    path_depth,
    registered_domain,
    resolve_outlink,
)


def test_lowercase_host_and_scheme():
    assert canonicalize_url("HTTP://ExAmple.COM/Path") == "http://example.com/Path"


def test_strip_www_variants():
    assert canonicalize_url("http://www.example.com/") == "http://example.com/"
    assert canonicalize_url("http://www2.example.com/") == "http://example.com/"
    assert canonicalize_url("http://wwwx.example.com/") == "http://wwwx.example.com/"


def test_strip_userinfo():
    assert canonicalize_url("http://user:pw@example.com/a") == "http://example.com/a"


def test_strip_default_port_keep_custom():
    assert canonicalize_url("http://example.com:80/a") == "http://example.com/a"
    assert canonicalize_url("https://example.com:443/a") == "https://example.com/a"
    assert canonicalize_url("http://example.com:8080/a") == "http://example.com:8080/a"


def test_strip_fragment():
    assert canonicalize_url("http://example.com/a#frag") == "http://example.com/a"


def test_session_params_stripped():
    assert (
        canonicalize_url("http://e.com/a?PHPSESSID=xyz&q=1")
        == "http://e.com/a?q=1"
    )
    assert canonicalize_url("http://e.com/a?jsessionid=x") == "http://e.com/a"
    assert canonicalize_url("http://e.com/a;jsessionid=X123?b=2") == "http://e.com/a?b=2"
    assert (
        canonicalize_url("http://e.com/a?CFID=1&CFTOKEN=2&keep=3")
        == "http://e.com/a?keep=3"
    )


def test_dot_segments_and_duplicate_slashes():
    assert canonicalize_url("http://e.com/a/b/../c") == "http://e.com/a/c"
    assert canonicalize_url("http://e.com//a///b") == "http://e.com/a/b"
    assert canonicalize_url("http://e.com") == "http://e.com/"
    assert canonicalize_url("http://e.com/a/") == "http://e.com/a/"


def test_percent_decode():
    assert canonicalize_url("http://e.com/%7Euser") == "http://e.com/~user"
    assert canonicalize_url("http://e.com/a%20b") == "http://e.com/a%20b"


def test_unsupported_schemes_rejected():
    for u in ("mailto:x@y.com", "javascript:void(0)", "ftp://e.com/f", ""):
        assert canonicalize_url(u) is None


def test_idempotent():
    urls = [
        "HTTP://User@WWW.Example.COM:80//A/./b/../C;jsessionid=ZZ?sid=1&x=2#f",
        "https://sub.domain.co.uk/path/?a=1&b=2",
    ]
    for u in urls:
        c1 = canonicalize_url(u)
        assert c1 is not None
        assert canonicalize_url(c1) == c1


def test_resolve_outlink():
    assert (
        resolve_outlink("http://e.com/dir/page.html", "../other.html")
        == "http://e.com/other.html"
    )
    assert resolve_outlink("http://e.com/a", "mailto:x@y") is None
    assert resolve_outlink("http://e.com/a", "//cdn.e.com/x") == "http://cdn.e.com/x"


def test_host_and_depth_helpers():
    assert host_of("http://a.b.c/x") == "a.b.c"
    assert path_depth("http://e.com/a/b/c") == 3
    assert path_depth("http://e.com/") == 0
    assert max_segment_repetitions("http://e.com/a/a/a/b") == 3
    assert max_segment_repetitions("http://e.com/a/b") == 1


def test_registered_domain():
    assert registered_domain("news.example.com") == "example.com"
    assert registered_domain("a.b.example.co.uk") == "example.co.uk"
    assert registered_domain("example.com") == "example.com"
    # platform hosts stay per-host (common.smk:23-29 semantics)
    assert registered_domain("myblog.blogspot.com") == "myblog.blogspot.com"
    assert registered_domain("site.wordpress.com") == "site.wordpress.com"


def test_psl_full_matcher():
    """tldextract-equivalent semantics over the vendored PSL rules
    (common.smk:17-36): multi-level ccTLD registries, wildcard rules,
    exception rules, private-section platforms, and bare-suffix hosts."""
    from bitextor_spark.functions.urls import public_suffix

    # multi-level ccTLD registries the 16-entry stub mis-grouped
    assert registered_domain("shop.store.co.kr") == "store.co.kr"
    assert registered_domain("www2.firma.com.tr") == "firma.com.tr"
    assert registered_domain("portal.hacienda.gob.mx") == "hacienda.gob.mx"
    assert registered_domain("x.y.escola.g12.br") == "escola.g12.br"
    assert registered_domain("a.uni.ac.za") == "uni.ac.za"
    assert registered_domain("svc.corp.com.cn") == "corp.com.cn"
    # plain gTLD unchanged
    assert registered_domain("deep.sub.example.org") == "example.org"
    # wildcard rule *.ck: one extra label is part of the suffix
    assert public_suffix("anything.ck") == "anything.ck"
    assert registered_domain("shop.anything.ck") == "shop.anything.ck"
    # exception rule !www.ck beats the wildcard
    assert public_suffix("www.ck") == "ck"
    assert registered_domain("www.ck") == "www.ck"
    assert registered_domain("foo.www.ck") == "www.ck"
    # host that IS a public suffix maps to itself
    assert registered_domain("co.uk") == "co.uk"
    # private-section platforms: each subdomain is its own site key
    assert registered_domain("user.github.io") == "user.github.io"
    assert registered_domain("deep.user.github.io") == "user.github.io"


def test_clean_abs_re2_veto_form_equivalent():
    """The flat resolver re-expresses _CLEAN_ABS_RE (which uses lookaheads
    RE2 cannot run) as a broad RE2 match + three vetoes. Pin the two forms
    equivalent over a generated corpus that exercises every boundary: www
    prefixes, dot segments, duplicate slashes, case, ports, queries,
    fragments, escapes, userinfo, relative forms, unicode."""
    import itertools

    import pyarrow as pa
    import pyarrow.compute as pc

    from bitextor_spark.functions.urls import (
        _ABS_BROAD_RE2,
        _CLEAN_ABS_RE,
    )

    schemes = ["http", "https", "HTTP", "ftp", ""]
    hosts = ["ex.com", "a.b.ex.com", "www.ex.com", "www2.ex.com", "wwwx.ex.com",
             "EX.com", "ex", "ex..com", "-x.com", "ex.com:80", "u:p@ex.com"]
    paths = ["/", "/a.html", "/a/b.html", "", "/a//b", "/.hid", "/a/.h",
             "/a%20b", "/a?q=1", "/a#f", "/a b", "/ünï", "/a/", "/..", "/a/../b",
             "/trailing.", "/~u/p_x-1.htm"]
    corpus = [f"{s}://{h}{p}" for s, h, p in itertools.product(schemes, hosts, paths)]
    corpus += ["rel.html", ".hidden", "", "//proto-rel.com/x", "mailto:x@y",
               "javascript:void(0)", "http:/one-slash.com/x"]

    arr = pa.array(corpus)
    ex = pc.extract_regex(arr, _ABS_BROAD_RE2)
    h = pc.struct_field(ex, "h")
    p = pc.struct_field(ex, "p")
    veto = pc.or_kleene(
        pc.match_substring_regex(h, r"^www[0-9]*\."),
        pc.or_kleene(pc.match_substring(p, "//"), pc.match_substring(p, "/.")),
    )
    re2_mask = (
        pc.and_kleene(pc.is_valid(ex), pc.invert(veto))
        .fill_null(False)
        .to_pylist()
    )
    lookahead_mask = [bool(_CLEAN_ABS_RE.match(s)) for s in corpus]
    diffs = [s for s, a, b in zip(corpus, re2_mask, lookahead_mask) if a != b]
    assert not diffs, f"{len(diffs)} divergent: {diffs[:10]}"


def test_clean_abs_re2_veto_form_equivalent_fuzz():
    """Property fuzz of the same RE2-vs-lookahead equivalence: random
    compositions of URL fragments (schemes, separators, www variants, dot
    segments, escapes, unicode, whitespace) hit boundary shapes the
    handcrafted product corpus above does not enumerate. Pure
    Python+Arrow — no Spark session — so thousands of strings are cheap."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bitextor_spark.functions.urls import _ABS_BROAD_RE2, _CLEAN_ABS_RE

    frag = st.sampled_from([
        "http", "https", "HTTP", "hTtP", "ftp", "file", "://", ":/", ":",
        "//", "/", "www", "www2", "www10", "wwwx", "w", ".", "..", "ex",
        "com", "a", "b-1", "_u", "~p", "?q=1", "#f", "%20", "%zz", ":80",
        ":8080", "@", "u:p@", "ü", "é", " ", "\t", "", "mailto:", "void(0)",
    ])
    url_strings = st.lists(frag, min_size=0, max_size=12).map("".join)

    def lookahead(s: str) -> bool:
        return bool(_CLEAN_ABS_RE.match(s))

    def re2_veto(batch: list[str]) -> list[bool]:
        ex = pc.extract_regex(pa.array(batch, type=pa.string()), _ABS_BROAD_RE2)
        h = pc.struct_field(ex, "h")
        p = pc.struct_field(ex, "p")
        veto = pc.or_kleene(
            pc.match_substring_regex(h, r"^www[0-9]*\."),
            pc.or_kleene(pc.match_substring(p, "//"), pc.match_substring(p, "/.")),
        )
        return (
            pc.and_kleene(pc.is_valid(ex), pc.invert(veto))
            .fill_null(False)
            .to_pylist()
        )

    @settings(max_examples=200, deadline=None)
    @given(st.lists(url_strings, min_size=1, max_size=64))
    def run(batch):
        got = re2_veto(batch)
        want = [lookahead(s) for s in batch]
        diffs = [s for s, a, b in zip(batch, got, want) if a != b]
        assert not diffs, f"divergent: {diffs[:5]!r}"

    run()
