"""Port of the URL helper contract
(/root/reference/tests/unit/url-helpers.test.ts)."""

from reader_spark.functions.urls import (
    get_url_key,
    is_content_url,
    is_same_domain,
    is_valid_url,
    matches_patterns,
    normalize_url,
    resolve_url,
    rewrite_url,
    should_include_url,
    validate_urls,
)


class TestIsValidUrl:
    def test_http(self):
        assert is_valid_url("http://example.com")

    def test_https(self):
        assert is_valid_url("https://example.com")

    def test_with_path(self):
        assert is_valid_url("https://example.com/path/to/page")

    def test_with_query(self):
        assert is_valid_url("https://example.com?q=test&page=1")

    def test_rejects_empty(self):
        assert not is_valid_url("")

    def test_rejects_plain_text(self):
        assert not is_valid_url("not a url")


class TestGetUrlKey:
    def test_www_normalized(self):
        assert get_url_key("https://www.example.com") == get_url_key("https://example.com")

    def test_hash_removed(self):
        assert get_url_key("https://example.com#section") == get_url_key("https://example.com")

    def test_query_removed(self):
        assert get_url_key("https://example.com/a?x=1") == get_url_key("https://example.com/a")

    def test_trailing_slash(self):
        assert get_url_key("https://example.com/") == get_url_key("https://example.com")

    def test_index_files(self):
        assert get_url_key("https://example.com/index.html") == get_url_key(
            "https://example.com/"
        )

    def test_default_port(self):
        assert get_url_key("https://example.com:443/a") == get_url_key(
            "https://example.com/a"
        )

    def test_path_differences_preserved(self):
        assert get_url_key("https://example.com/a") != get_url_key("https://example.com/b")

    def test_lowercases(self):
        key = get_url_key("https://EXAMPLE.com/PaGe")
        assert key == key.lower()


class TestIsSameDomain:
    def test_same(self):
        assert is_same_domain("https://example.com/a", "https://example.com/b")

    def test_www_difference(self):
        assert is_same_domain("https://www.example.com", "https://example.com")

    def test_different(self):
        assert not is_same_domain("https://example.com", "https://other.com")

    def test_subdomains_strict(self):
        assert not is_same_domain("https://blog.example.com", "https://example.com")
        assert not is_same_domain(
            "https://dashboard.stripe.com", "https://docs.stripe.com"
        )


class TestResolveNormalize:
    def test_relative_against_base(self):
        assert resolve_url("/about", "https://example.com") == "https://example.com/about"

    def test_absolute_passthrough(self):
        assert "other.com" in resolve_url("https://other.com/x", "https://example.com")

    def test_fragment_only(self):
        assert "example.com" in resolve_url("#top", "https://example.com/page")

    def test_root_relative_dot_segments_removed(self):
        """Dot segments must not survive the root-relative fast path — the
        reference's new URL() removes them per RFC 3986."""
        base = "https://x.com/p"
        assert resolve_url("/a/../b", base) == "https://x.com/b"
        assert resolve_url("/./x", base) == "https://x.com/x"
        assert resolve_url("/a/b/..", base) == "https://x.com/a/"
        assert resolve_url("/a/.", base) == "https://x.com/a/"
        # plain root-relative refs still take the verbatim fast path
        assert resolve_url("/a.b/c..d", base) == "https://x.com/a.b/c..d"

    def test_normalize_strips_fragment(self):
        assert normalize_url("https://example.com/a#frag") == "https://example.com/a"

    def test_normalize_resolves_relative(self):
        assert (
            normalize_url("/favicon.ico", "https://example.com")
            == "https://example.com/favicon.ico"
        )

    def test_normalize_raises_on_relative_without_base(self):
        import pytest

        with pytest.raises(ValueError):
            normalize_url("/relative")


class TestValidateUrls:
    def test_valid_batch(self):
        ok, valid, errors = validate_urls(["https://a.com", "http://b.com"])
        assert ok and valid == ["https://a.com", "http://b.com"] and not errors

    def test_empty_list(self):
        ok, valid, errors = validate_urls([])
        assert not ok and errors

    def test_dedup_order_preserving(self):
        _, valid, _ = validate_urls(["https://a.com", "https://b.com", "https://a.com"])
        assert valid == ["https://a.com", "https://b.com"]

    def test_non_http_rejected(self):
        ok, valid, errors = validate_urls(["ftp://a.com"])
        assert not ok and not valid and errors


class TestPatterns:
    def test_matches_any(self):
        assert matches_patterns("https://example.com/blog/post", [r"/blog/"])

    def test_invalid_regex_skipped(self):
        assert not matches_patterns("https://example.com", ["[unclosed"])

    def test_include_exclude(self):
        assert should_include_url("https://a.com/blog/x", [r"/blog/"], None)
        assert not should_include_url("https://a.com/shop/x", [r"/blog/"], None)
        assert not should_include_url("https://a.com/blog/x", None, [r"/blog/"])
        assert should_include_url("https://a.com/anything", None, None)


class TestIsContentUrl:
    def test_rejects_legal_pages(self):
        assert not is_content_url("https://a.com/privacy-policy")
        assert not is_content_url("https://a.com/terms")

    def test_rejects_auth(self):
        assert not is_content_url("https://a.com/admin/panel")
        assert not is_content_url("https://a.com/login/start")

    def test_rejects_extensions(self):
        assert not is_content_url("https://a.com/file.pdf")
        assert not is_content_url("https://a.com/file.zip")

    def test_accepts_articles(self):
        assert is_content_url("https://a.com/blog/how-to-scrape")


class TestRewriteUrl:
    def test_identity_by_default(self):
        assert rewrite_url("https://a.com/x", ()) == "https://a.com/x"

    def test_first_match_wins(self):
        rules = (
            (r"docs\.google\.com/document/d/([\w-]+).*", r"https://docs.google.com/document/d/\1/export?format=txt"),
            (r"docs\.google\.com.*", "https://unused"),
        )
        out = rewrite_url("https://docs.google.com/document/d/abc123/edit", rules)
        assert out == "https://docs.google.com/document/d/abc123/export?format=txt"


class TestUrlVariantClusters:
    def test_cluster_and_election(self, spark):
        from pyspark.sql import Row

        from reader_spark.ops.dedup import url_variant_clusters

        df = spark.createDataFrame(
            [
                Row(url="https://www.a.com:443/Docs/1/index.html?x=1#f"),
                Row(url="https://a.com/docs/1"),
                Row(url="https://a.com/docs/1/"),
                Row(url="https://a.com/docs/1"),  # duplicate hit
                Row(url="https://b.com/other"),
            ]
        )
        got = {r.url_key: r for r in url_variant_clusters(df).collect()}
        c1 = got["https://a.com/docs/1"]
        assert c1.n_hits == 4
        assert c1.n_variants == 3
        assert c1.canonical_url == "https://a.com/docs/1"  # shortest raw
        assert got["https://b.com/other"].n_variants == 1

    def test_tie_breaks_lexicographic(self, spark):
        from pyspark.sql import Row

        from reader_spark.ops.dedup import url_variant_clusters

        # same length, same key (case folds): lexicographically smaller
        # raw wins
        df = spark.createDataFrame(
            [Row(url="https://a.com/X"), Row(url="https://a.com/x")]
        )
        got = url_variant_clusters(df).collect()[0]
        assert got.canonical_url == "https://a.com/X"
