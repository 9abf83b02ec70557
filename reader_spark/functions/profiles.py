"""Domain profiles (reference: src/config/domain-profiles.ts) — per-domain
config overrides, default-empty.

Pure form here; the dataset form (J4, SURVEY.md §2.7) is a broadcast join of
a tiny profiles dimension on host_key with an exploded-suffix fallback —
see reader_spark.spark.profiles_join.
"""

from __future__ import annotations

from typing import Any, Optional
from urllib.parse import urlsplit


def get_domain_profile(
    url_or_hostname: str, profiles: Optional[dict[str, dict[str, Any]]]
) -> Optional[dict[str, Any]]:
    """getDomainProfile — domain-profiles.ts:39-67: exact hostname match
    first (www. stripped), then suffix match `.domain`."""
    if not profiles:
        return None
    if "://" in url_or_hostname:
        try:
            hostname = urlsplit(url_or_hostname).hostname or ""
        except Exception:
            return None
    else:
        hostname = url_or_hostname
    hostname = hostname.removeprefix("www.")
    if hostname in profiles:
        return profiles[hostname]
    for domain, profile in profiles.items():
        if hostname.endswith("." + domain):
            return profile
    return None


def apply_domain_profile(
    options: dict[str, Any], profile: dict[str, Any]
) -> dict[str, Any]:
    """applyDomainProfile — domain-profiles.ts:73-90: merge with user
    precedence (coalesce(user_opt, profile_opt))."""
    merged = dict(options)
    for key, value in profile.items():
        if value and not options.get(key):
            merged[key] = value
    return merged
