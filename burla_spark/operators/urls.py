"""URL canonicalization for domain-level curation (round 13).

Common-crawl-style pipelines cap, dedup, and mix by REGISTRABLE DOMAIN,
not by whatever source label the feed carried: one crawl dump holds
millions of hosts, and ``www.example.com`` / ``cdn.example.com:8080`` /
``https://user@EXAMPLE.com./page?q=1`` are all the same publisher.

Two column-expression helpers, both pure JVM string ops (split /
substring_index / lower — whole-stage-codegen, no UDF, and every step
is replayable by an external SQL oracle):

* :func:`canonical_host` — scheme, userinfo, port, path, query,
  fragment stripped; lowercased; trailing dots removed.
* :func:`registrable_domain` — last two labels of the host, or last
  THREE when the 2-label tail is a multi-label public suffix
  (``co.uk``, ``com.au``, ...). The suffix set is a deliberately small
  built-in subset of the public-suffix list — enough for the common
  ccTLD second-level registries; callers with full-PSL needs pass
  their own ``suffixes`` tuple (the rule is the same: match the
  2-label tail, keep 3).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# abbreviated public-suffix subset: the high-traffic two-label
# registries. Parameterizable — this is a default, not a claim of PSL
# completeness.
MULTI_LABEL_SUFFIXES: tuple[str, ...] = (
    "co.uk", "org.uk", "gov.uk", "ac.uk", "me.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.in", "net.in", "org.in",
    "com.br", "net.br", "org.br",
    "com.cn", "net.cn", "org.cn",
    "com.mx", "com.ar", "com.tr", "com.sg", "com.my", "com.hk",
    "co.za", "co.kr", "co.nz", "co.th", "co.id",
)


def canonical_host(url: Column) -> Column:
    """Lowercased bare hostname of a URL-ish string: strips scheme
    (anything before ``://``), userinfo (through ``@``), port
    (after ``:``), path / query / fragment (after ``/`` ``?`` ``#``),
    and trailing dots. Scheme-less inputs (``example.com/page``) work
    too. NULL in → NULL out."""
    u = F.trim(url)
    after = F.when(
        u.contains("://"), F.substring_index(u, "://", -1)
    ).otherwise(u)
    auth = F.substring_index(
        F.substring_index(F.substring_index(after, "/", 1), "?", 1), "#", 1
    )
    auth = F.when(
        auth.contains("@"), F.substring_index(auth, "@", -1)
    ).otherwise(auth)
    host = F.substring_index(auth, ":", 1)
    return F.lower(F.regexp_replace(host, r"\.+$", ""))


def registrable_domain(
    host: Column, suffixes: tuple[str, ...] = MULTI_LABEL_SUFFIXES
) -> Column:
    """Registrable domain of a canonical host: the last two labels,
    or the last three when the two-label tail is a known multi-label
    public suffix. Single-label hosts (``localhost``) pass through.
    F.get (0-based, NULL out of range) keeps short hosts total —
    no ANSI out-of-bounds errors."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    l1 = F.get(labels, n - 1)
    l2 = F.get(labels, n - 2)
    l3 = F.get(labels, n - 3)
    last2 = F.concat_ws(".", l2, l1)
    last3 = F.concat_ws(".", l3, l2, l1)
    return (
        # concat_ws skips NULLs, so a NULL host would otherwise fall
        # through to '' — keep NULL in → NULL out
        F.when(host.isNull(), F.lit(None).cast("string"))
        .when(n <= 1, host)
        .when((n >= 3) & last2.isin(*suffixes), last3)
        .otherwise(last2)
    )
