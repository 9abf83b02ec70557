"""Domain profiles: pure lookup (domain-profiles.ts contract) + the
broadcast-join dataset form (J4)."""

import pytest

from reader_spark.functions.profiles import apply_domain_profile, get_domain_profile

PROFILES = {
    "amazon.com": {"timeoutMs": 60000, "batchConcurrency": 1},
    "docs.stripe.com": {"timeoutMs": 20000},
}


class TestPureLookup:
    def test_exact_hostname(self):
        assert get_domain_profile("docs.stripe.com", PROFILES)["timeoutMs"] == 20000

    def test_url_form_and_www_strip(self):
        assert (
            get_domain_profile("https://www.amazon.com/dp/x", PROFILES)["timeoutMs"]
            == 60000
        )

    def test_suffix_match(self):
        assert get_domain_profile("shop.amazon.com", PROFILES)["timeoutMs"] == 60000

    def test_no_match(self):
        assert get_domain_profile("example.com", PROFILES) is None
        assert get_domain_profile("example.com", None) is None

    def test_clone_domain_not_matched(self):
        # domain-profiles.test.ts "does not match amazonclone.com": suffix
        # matching must respect the label boundary (".amazon.com"), not be
        # a bare substring/endswith test.
        assert get_domain_profile("amazonclone.com", PROFILES) is None

    def test_url_with_port(self):
        # domain-profiles.test.ts "handles URL with port"
        assert get_domain_profile("https://amazon.com:443/dp/x", PROFILES) is not None

    def test_invalid_url_returns_none(self):
        # domain-profiles.test.ts "returns undefined for invalid URL"
        assert get_domain_profile("not a url at all", PROFILES) is None

    def test_empty_profiles(self):
        # domain-profiles.test.ts "returns undefined when no profiles provided"
        assert get_domain_profile("amazon.com", {}) is None

    def test_multipart_tld_exact(self):
        # domain-profiles.test.ts "international Amazon domains"
        profiles = {"amazon.co.uk": {"timeoutMs": 1}, "amazon.co.jp": {"timeoutMs": 2}}
        assert get_domain_profile("amazon.co.uk", profiles)["timeoutMs"] == 1
        assert get_domain_profile("www.amazon.co.jp", profiles)["timeoutMs"] == 2

    def test_deep_subdomain(self):
        # domain-profiles.test.ts "matches smile.amazon.com"
        assert get_domain_profile("smile.amazon.com", PROFILES)["timeoutMs"] == 60000

    def test_merge_user_precedence(self):
        merged = apply_domain_profile(
            {"timeoutMs": 5000, "batchConcurrency": None},
            {"timeoutMs": 60000, "batchConcurrency": 2},
        )
        assert merged["timeoutMs"] == 5000  # user wins
        assert merged["batchConcurrency"] == 2  # profile fills the gap


@pytest.mark.spark
class TestBroadcastJoin:
    def test_join_exact_and_suffix(self, spark):
        from reader_spark.spark.dims import join_domain_profiles

        urls = spark.createDataFrame(
            [
                ("https://www.amazon.com/dp/1",),
                ("https://shop.amazon.com/cart2",),
                ("https://docs.stripe.com/api",),
                ("https://nothing.test/x",),
            ],
            "url string",
        )
        profiles = spark.createDataFrame(
            [("amazon.com", 60000), ("docs.stripe.com", 20000)],
            "domain string, timeoutMs int",
        )
        got = {
            r["url"]: (r["profile"]["timeoutMs"] if r["profile"] else None)
            for r in join_domain_profiles(urls, profiles).collect()
        }
        assert got["https://www.amazon.com/dp/1"] == 60000
        assert got["https://shop.amazon.com/cart2"] == 60000
        assert got["https://docs.stripe.com/api"] == 20000
        assert got["https://nothing.test/x"] is None
