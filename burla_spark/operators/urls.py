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


def _after_first(s: Column, sep: str) -> Column:
    """Everything after the FIRST occurrence of ``sep`` (caller must
    guard on ``s.contains(sep)``). ``substring_index(s, sep, -1)``
    cuts at the LAST occurrence — wrong for URLs whose query embeds
    another URL (``?next=https://evil.com/``) or a literal ``?``
    (legal per RFC 3986), both common in real crawl data (ADVICE
    r13)."""
    return s.substr(F.locate(sep, s) + len(sep), F.length(s))


def _bind(col: Column, f) -> Column:
    """Bind ``col`` as a lambda variable and apply ``f`` to it —
    ``get(transform(array(col), f), 0)``. Column expressions are
    TREES: every re-reference of a Python variable duplicates its
    whole subtree, so a chain like url → rest → nofrag → path/query
    (each step referencing the previous 2-3 times) grows the
    expression exponentially — at round-14 measurement the un-bound
    canonical_url spent ~10 s of a 5000-ROW query in optimizer/
    codegen alone. A higher-order-function lambda variable is bound
    once and referenced by attribute, keeping the tree linear; the
    array wrap is one element and stays JVM-side."""
    return F.get(F.transform(F.array(col), f), 0)


def canonical_host(url: Column) -> Column:
    """Lowercased bare hostname of a URL-ish string: strips scheme
    (anything before the FIRST ``://`` — an embedded absolute URL in
    the query must not win), userinfo (through ``@``), port
    (after ``:``), path / query / fragment (after ``/`` ``?`` ``#``),
    and trailing dots. Scheme-less inputs (``example.com/page``) work
    too. NULL in → NULL out. Intermediates are lambda-bound
    (:func:`_bind`) so the expression tree stays linear when this
    feeds further derivations (registrable_domain, caps)."""

    def strip_auth(auth: Column) -> Column:
        bare = F.when(
            auth.contains("@"), F.substring_index(auth, "@", -1)
        ).otherwise(auth)
        host = F.substring_index(bare, ":", 1)
        return F.lower(F.regexp_replace(host, r"\.+$", ""))

    def from_rest(after: Column) -> Column:
        return _bind(
            F.substring_index(
                F.substring_index(F.substring_index(after, "/", 1), "?", 1),
                "#",
                1,
            ),
            strip_auth,
        )

    return _bind(
        F.trim(url),
        lambda u: _bind(
            F.when(u.contains("://"), _after_first(u, "://")).otherwise(u),
            from_rest,
        ),
    )


def registrable_domain(
    host: Column, suffixes: tuple[str, ...] = MULTI_LABEL_SUFFIXES
) -> Column:
    """Registrable domain of a canonical host: the last two labels,
    or the last three when the two-label tail is a known multi-label
    public suffix. Single-label hosts (``localhost``) pass through.
    F.get (0-based, NULL out of range) keeps short hosts total —
    no ANSI out-of-bounds errors."""

    def from_labels(x: Column) -> Column:
        h, labels = x["h"], x["l"]
        n = F.size(labels)
        l1 = F.get(labels, n - 1)
        l2 = F.get(labels, n - 2)
        l3 = F.get(labels, n - 3)
        last2 = F.concat_ws(".", l2, l1)
        last3 = F.concat_ws(".", l3, l2, l1)
        return (
            # concat_ws skips NULLs, so a NULL host would otherwise
            # fall through to '' — keep NULL in → NULL out
            F.when(h.isNull(), F.lit(None).cast("string"))
            .when(n <= 1, h)
            .when((n >= 3) & last2.isin(*suffixes), last3)
            .otherwise(last2)
        )

    return _bind(
        host,
        lambda h: _bind(
            F.struct(h.alias("h"), F.split(h, r"\.").alias("l")), from_labels
        ),
    )


# query parameters that identify a CLICK, not a page — stripped by the
# canonicalizer (the common-crawl URL-dedup convention). Prefix match.
TRACKING_PARAM_PREFIXES: tuple[str, ...] = (
    "utm_", "fbclid", "gclid", "msclkid", "mc_cid", "mc_eid", "ref_src",
)


def pct_normalize(s: Column) -> Column:
    """RFC 3986 §6.2.2 percent-encoding normalization, as pure JVM
    string/array expressions (split + indexed transform + conv/char —
    no UDF): hex digits of every ``%XY`` triplet are UPPERCASED
    (``%2f`` → ``%2F``), and triplets encoding UNRESERVED characters
    (ALPHA / DIGIT / ``-`` ``.`` ``_`` ``~``) are DECODED
    (``%7E`` → ``~``, ``%61`` → ``a``) — the two equivalences every
    conforming URL producer may emit freely, so a dedup key must fold
    them. Reserved characters stay encoded (``%2F`` is NOT a path
    ``/``). Malformed ``%`` sequences pass through untouched.

    Decoding can only produce unreserved characters, never ``&`` ``=``
    ``/`` ``?`` — so normalizing a whole path or query string before
    splitting it on those delimiters is safe.

    Fast path: strings with no ``%`` (the overwhelming majority of
    real crawl URLs) pass through untouched — the split/transform
    machinery only runs on rows that contain an escape."""

    def fix(p: Column, i: Column) -> Column:
        code = F.upper(p.substr(F.lit(1), F.lit(2)))
        rest = p.substr(F.lit(3), F.length(p))
        n = F.conv(code, 16, 10).cast("int")
        unreserved = (
            n.between(48, 57)   # 0-9
            | n.between(65, 90)  # A-Z
            | n.between(97, 122)  # a-z
            | n.isin(45, 46, 95, 126)  # - . _ ~
        )
        return (
            F.when(i == 0, p)  # text before the first '%'
            .when(~code.rlike("^[0-9A-F]{2}$"), F.concat(F.lit("%"), p))
            .when(unreserved, F.concat(F.char(n), rest))
            .otherwise(F.concat(F.lit("%"), code, rest))
        )

    return _bind(
        s,
        lambda ss: F.when(~ss.contains("%"), ss).otherwise(
            F.array_join(F.transform(F.split(ss, "%", -1), fix), "")
        ),
    )


def idn_fold_host(host: Column) -> Column:
    """IDN host folding (production helper, NOT in any oracled spec —
    no SQL engine replays punycode): Unicode hostnames fold to their
    IDNA ASCII form (``münchen.de`` → ``xn--mnchen-3ya.de``) so a
    crawl that saw both spellings dedups them; ASCII hosts pass
    through lowercased. Vectorized Arrow-batched UDF over the stdlib
    ``idna`` codec; hosts the codec rejects fall back to plain
    lowercase (never NULL a row for a weird host)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def fold(hosts):  # type: ignore[no-untyped-def]
        def one(h):
            if h is None:
                return None
            try:
                # the stdlib codec passes all-ASCII labels through
                # byte-for-byte — lowercase explicitly for a stable key
                return h.encode("idna").decode("ascii").lower()
            except (UnicodeError, ValueError):
                return h.lower()

        return hosts.map(one)

    return fold(host)


def canonical_url(
    url: Column,
    tracking_prefixes: tuple[str, ...] = TRACKING_PARAM_PREFIXES,
) -> Column:
    """Full URL canonicalization for exact URL-level dedup: lowercase
    scheme + host (path stays case-SENSITIVE), userinfo stripped,
    default ports dropped (http:80 / https:443 — a non-default port is
    identity and survives), fragment dropped, percent-encoding
    normalized in path and query (:func:`pct_normalize` — hex
    uppercased, unreserved chars decoded, so ``/p%61ge`` and ``/page``
    collide), tracking query params (``utm_*``, ``fbclid``, ...)
    removed, remaining params SORTED so ``?b=2&a=1`` and ``?a=1&b=2``
    collide, empty path normalized to ``/``. Scheme-less inputs
    default to http. The scheme splits at the FIRST ``://`` and the
    query at the FIRST ``?`` (ADVICE r13 — embedded absolute URLs and
    literal ``?`` in queries are common in crawls). Pure JVM
    string/array expressions — no UDF, replayable by a SQL oracle.
    NULL in → NULL out.

    Every derivation stage is lambda-bound (:func:`_bind`): the
    url → rest → nofrag → authpath → auth chain references each
    predecessor 2-3 times, so naive Column composition duplicates
    subtrees exponentially (measured: ~10 s of optimizer/codegen on a
    5000-row fixture before binding; milliseconds after)."""

    def assemble(x: Column) -> Column:
        return F.concat(
            x["s"],
            F.lit("://"),
            x["h"],
            x["pp"],
            x["p"],
            F.when(
                F.length(x["q2"]) > 0, F.concat(F.lit("?"), x["q2"])
            ).otherwise(F.lit("")),
        )

    def with_noduser(x: Column) -> Column:
        scheme, noduser, path, query = x["s"], x["nd"], x["p"], x["q"]
        host = F.lower(
            F.regexp_replace(F.substring_index(noduser, ":", 1), r"\.+$", "")
        )
        port = F.when(
            noduser.contains(":"), F.substring_index(noduser, ":", -1)
        ).otherwise(F.lit(""))
        default_port = ((scheme == "http") & (port == "80")) | (
            (scheme == "https") & (port == "443")
        )
        port_part = F.when(
            (port == "") | default_port, F.lit("")
        ).otherwise(F.concat(F.lit(":"), port))
        params = F.array_sort(
            F.filter(
                F.split(query, "&", -1),
                lambda p: (F.length(p) > 0)
                & ~_any_prefix(p, tracking_prefixes),
            )
        )
        return _bind(
            F.struct(
                scheme.alias("s"),
                host.alias("h"),
                port_part.alias("pp"),
                path.alias("p"),
                F.array_join(params, "&").alias("q2"),
            ),
            assemble,
        )

    def with_auth(x: Column) -> Column:
        scheme, auth, authpath, query = x["s"], x["a"], x["ap"], x["q"]
        raw_path = F.substring(authpath, F.length(auth) + 1, F.lit(2**31 - 1))
        path = F.when(F.length(raw_path) == 0, F.lit("/")).otherwise(
            pct_normalize(raw_path)
        )
        noduser = F.when(
            auth.contains("@"), F.substring_index(auth, "@", -1)
        ).otherwise(auth)
        return _bind(
            F.struct(
                scheme.alias("s"),
                noduser.alias("nd"),
                path.alias("p"),
                query.alias("q"),
            ),
            with_noduser,
        )

    def with_nofrag(x: Column) -> Column:
        scheme, nofrag = x["s"], x["n"]
        authpath = F.substring_index(nofrag, "?", 1)
        query = F.when(
            nofrag.contains("?"), pct_normalize(_after_first(nofrag, "?"))
        ).otherwise(F.lit(""))
        return _bind(
            F.struct(
                scheme.alias("s"),
                F.substring_index(authpath, "/", 1).alias("a"),
                authpath.alias("ap"),
                query.alias("q"),
            ),
            with_auth,
        )

    def with_u(u: Column) -> Column:
        has_scheme = u.contains("://")
        scheme = F.when(
            has_scheme, F.lower(F.substring_index(u, "://", 1))
        ).otherwise(F.lit("http"))
        rest = F.when(has_scheme, _after_first(u, "://")).otherwise(u)
        return _bind(
            F.struct(
                scheme.alias("s"), F.substring_index(rest, "#", 1).alias("n")
            ),
            with_nofrag,
        )

    return F.when(url.isNull(), F.lit(None).cast("string")).otherwise(
        _bind(F.trim(url), with_u)
    )


def _any_prefix(p: Column, prefixes: tuple[str, ...]) -> Column:
    """OR-fold of startswith checks (helper for canonical_url's param
    filter lambda)."""
    out = F.lit(False)
    for pre in prefixes:
        out = out | p.startswith(pre)
    return out
