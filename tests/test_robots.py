"""robots.txt parse + admission tests (RFC 9309 subset per the module
docstring). Corpus-level end-to-end admission is oracle-checked by
q_robots in tests/test_entry_oracle.py."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.spark


BODY_MAIN = """# corpus crawler policy
User-agent: TrainBot
User-agent: otherbot
Disallow: /private/
Allow: /private/ok
Crawl-delay: 5

User-agent: *
Disallow: /
"""

BODY_STAR_ONLY = """User-agent: *
Disallow: /tmp/
Disallow:
Allow: /tmp/keep$
"""


def _rules(spark, rows):
    from htmlparser2_spark.operators.robots import parse_robots

    df = spark.createDataFrame(rows, "host string, body string")
    return parse_robots(df)


def test_parse_groups_agents_and_comments(spark):
    rules = _rules(spark, [("h1", BODY_MAIN)])
    got = {(r["agent"], r["rule"], r["path"]) for r in rules.collect()}
    # Both stanza agents inherit both rules; Crawl-delay ignored;
    # comment line ignored; '*' group separate.
    assert got == {
        ("trainbot", "disallow", "/private/"),
        ("trainbot", "allow", "/private/ok"),
        ("otherbot", "disallow", "/private/"),
        ("otherbot", "allow", "/private/ok"),
        ("*", "disallow", "/"),
    }


def test_crawl_delays_per_group(spark):
    """Delay attaches to every agent of its stanza; groups without a
    delay emit nothing; min wins across duplicates; invalid -> NULL."""
    from htmlparser2_spark.operators.robots import crawl_delays

    df = spark.createDataFrame(
        [
            ("h1", BODY_MAIN),  # shared stanza delay 5; '*' has none
            ("h2", "User-agent: a\nCrawl-delay: 3\nCrawl-delay: 1.5\n"
                   "\nUser-agent: b\nCrawl-delay: nope"),
        ],
        "host string, body string",
    )
    got = {(r["host"], r["agent"]): r["delay_sec"]
           for r in crawl_delays(df).collect()}
    assert got == {
        ("h1", "trainbot"): 5.0,
        ("h1", "otherbot"): 5.0,
        ("h2", "a"): 1.5,
        ("h2", "b"): None,
    }


def test_parse_rules_before_any_group_dropped(spark):
    rules = _rules(spark, [("h1", "Disallow: /x\nUser-agent: *\nAllow: /y")])
    got = {(r["agent"], r["rule"], r["path"]) for r in rules.collect()}
    assert got == {("*", "allow", "/y")}


def _admit(spark, rules, urls, agent):
    from htmlparser2_spark.operators.robots import evaluate_robots

    u = spark.createDataFrame([(x,) for x in urls], "url string")
    return {r["url"]: r["allowed"] for r in
            evaluate_robots(u, rules, agent).collect()}


def test_exact_group_shadows_star(spark):
    rules = _rules(spark, [("h1", BODY_MAIN)])
    urls = [
        "https://h1/private/x",      # trainbot group: disallowed prefix
        "https://h1/private/ok/page", # longer Allow wins
        "https://h1/public",          # no matching rule in exact group
    ]
    got = _admit(spark, rules, urls, "TrainBot")
    assert got == {
        "https://h1/private/x": False,
        "https://h1/private/ok/page": True,
        "https://h1/public": True,  # '*' Disallow:/ shadowed by exact group
    }
    # An unknown agent falls to '*': everything blocked.
    got_star = _admit(spark, rules, urls, "randombot")
    assert got_star == {u: False for u in urls}


def test_empty_disallow_anchor_and_missing_host(spark):
    rules = _rules(spark, [("h2", BODY_STAR_ONLY)])
    urls = [
        "https://h2/tmp/x",     # blocked by /tmp/ prefix
        "https://h2/tmp/keep",  # anchored Allow exactly matches (tie len, allow wins? longer)
        "https://h2/tmp/keeper",  # anchor does NOT match the longer path
        "https://h2/",          # empty Disallow matches nothing
        "https://nowhere/x",    # no rules for host -> allowed
    ]
    got = _admit(spark, rules, urls, "anybot")
    assert got == {
        "https://h2/tmp/x": False,
        "https://h2/tmp/keep": True,
        "https://h2/tmp/keeper": False,
        "https://h2/": True,
        "https://nowhere/x": True,
    }


def test_allow_wins_length_tie(spark):
    rules = _rules(spark, [("h3", "User-agent: *\nDisallow: /a/\nAllow: /a/")])
    got = _admit(spark, rules, ["https://h3/a/x"], "bot")
    assert got == {"https://h3/a/x": True}


def test_run_frontier_funnel_and_budget(spark):
    """Frontier plan: fragment dupes collapse at canonical, a blocked
    host drops at admitted, the budget caps per-host rows, ranked
    hosts carry their PageRank and unranked hosts 0.0."""
    from htmlparser2_spark.operators.robots import parse_robots
    from htmlparser2_spark.plans.crawl_job import run_frontier

    robots = spark.createDataFrame(
        [("blocked.ex", "User-agent: *\nDisallow: /")],
        "host string, body string",
    )
    cands = spark.createDataFrame(
        [("https://a.ex/p1",), ("https://a.ex/p1#x",), ("https://a.ex/p2",),
         ("https://a.ex/p3",), ("https://blocked.ex/q",)],
        "url string",
    )
    edges = spark.createDataFrame(
        [("a.ex", "b.ex", 1)], "src string, dst string, weight long"
    )
    frontier, funnel = run_frontier(
        cands, parse_robots(robots), edges,
        agent="bot", per_host_budget=2, rank_iters=2,
    )
    counts = {r["stage"]: r["n_urls"] for r in funnel.collect()}
    assert counts == {
        "ingest": 5, "canonical": 4, "admitted": 3, "frontier": 2,
    }
    rows = {r["url"]: r for r in frontier.collect()}
    assert set(rows) == {"https://a.ex/p1", "https://a.ex/p2"}
    assert all(r["host"] == "a.ex" and r["host_rank"] > 0 for r in rows.values())
    assert [rows["https://a.ex/p1"]["host_pos"],
            rows["https://a.ex/p2"]["host_pos"]] == [1, 2]


def test_run_frontier_crawl_delay_politeness(spark):
    """Crawl-delay caps each host at floor(window/delay): exact-agent
    delay shadows '*', an unparseable (NULL) delay falls back to the
    plain budget, and a delay longer than the window defers the host
    entirely (0 URLs this batch)."""
    from htmlparser2_spark.operators.robots import crawl_delays, parse_robots
    from htmlparser2_spark.plans.crawl_job import run_frontier

    robots = spark.createDataFrame(
        [
            # exact 2s (cap 3) shadows the star group's 1s (cap 6)
            ("a.ex", "User-agent: bot\nCrawl-delay: 2\nDisallow: /no\n\n"
                     "User-agent: *\nCrawl-delay: 1"),
            ("b.ex", "User-agent: *\nCrawl-delay: junk"),   # NULL -> budget
            ("c.ex", "User-agent: *\nCrawl-delay: 10"),     # 10 > 6 -> 0 URLs
        ],
        "host string, body string",
    )
    cands = spark.createDataFrame(
        [(f"https://{h}/p{i}",) for h in ("a.ex", "b.ex", "c.ex")
         for i in range(5)],
        "url string",
    )
    edges = spark.createDataFrame(
        [("a.ex", "b.ex", 1)], "src string, dst string, weight long"
    )
    frontier, _ = run_frontier(
        cands, parse_robots(robots), edges,
        agent="Bot", per_host_budget=4,
        delays=crawl_delays(robots), window_sec=6.0,
    )
    per_host = {
        r["host"]: r["n"]
        for r in frontier.groupBy("host").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert per_host == {"a.ex": 3, "b.ex": 4}  # c.ex deferred


def test_run_frontier_salted_prefilter(spark):
    """Hot-host bound: with a budget, a salted partial top-k runs
    before the exact per-host window — the plan carries TWO Window
    nodes (the first keyed on (host, salt)) — and the output is
    byte-identical to the unsalted ordering: the per-host smallest
    `budget` urls in order, for every salt_buckets setting."""
    from htmlparser2_spark.operators.robots import parse_robots
    from htmlparser2_spark.plans.crawl_job import run_frontier

    robots = spark.createDataFrame(
        [("none.ex", "User-agent: *\nAllow: /")],
        "host string, body string",
    )
    # One hot host (40 urls), one small host (3), budget 5.
    cands = spark.createDataFrame(
        [(f"https://hot.ex/p{i:03d}",) for i in range(40)]
        + [(f"https://small.ex/p{i}",) for i in range(3)],
        "url string",
    )
    edges = spark.createDataFrame(
        [("hot.ex", "small.ex", 1)], "src string, dst string, weight long"
    )
    expect = {
        (f"https://hot.ex/p{i:03d}", i + 1) for i in range(5)
    } | {(f"https://small.ex/p{i}", i + 1) for i in range(3)}
    for buckets in (1, 4, 32):
        frontier, _ = run_frontier(
            cands, parse_robots(robots), edges,
            agent="bot", per_host_budget=5, salt_buckets=buckets,
            checkpoint_stages=False,
        )
        got = {(r["url"], r["host_pos"]) for r in frontier.collect()}
        assert got == expect, f"salt_buckets={buckets}"
    frontier, _ = run_frontier(
        cands, parse_robots(robots), edges,
        agent="bot", per_host_budget=5, checkpoint_stages=False,
    )
    plan = frontier._jdf.queryExecution().executedPlan().toString()
    # The salted pre-filter window materializes (its _pre_pos alias is
    # in the plan) and Spark's rank-limit pushdown bounds both sorts
    # to top-k (WindowGroupLimit), so neither window fully sorts a
    # host even before salting is considered.
    assert "_pre_pos" in plan, plan
    assert "WindowGroupLimit" in plan, plan
    # Budget-less call keeps the single plain window (full ordering
    # is genuinely required without a cap).
    nofilter, _ = run_frontier(
        cands, parse_robots(robots), edges,
        agent="bot", checkpoint_stages=False,
    )
    plan2 = nofilter._jdf.queryExecution().executedPlan().toString()
    assert "_pre_pos" not in plan2, plan2
    assert nofilter.count() == 43


def test_ruleless_exact_group_shadows_star(spark):
    """The 'User-agent: x / Disallow:' whitelist idiom: the exact
    group survives parsing as a NULL presence row and shadows '*'
    while restricting nothing."""
    body = "User-agent: trainbot\nDisallow:\n\nUser-agent: *\nDisallow: /"
    rules = _rules(spark, [("h1", body)])
    presence = [r for r in rules.collect() if r["agent"] == "trainbot"]
    assert len(presence) == 1 and presence[0]["rule"] is None
    got = _admit(spark, rules, ["https://h1/anything"], "TrainBot")
    assert got == {"https://h1/anything": True}
    assert _admit(spark, rules, ["https://h1/anything"], "other") == {
        "https://h1/anything": False
    }


def test_query_string_rules_match(spark):
    rules = _rules(spark, [("h1", "User-agent: *\nDisallow: /search?q=")])
    got = _admit(
        spark,
        rules,
        ["https://h1/search?q=x", "https://h1/search", "https://h1/search?p=1"],
        "bot",
    )
    assert got == {
        "https://h1/search?q=x": False,
        "https://h1/search": True,
        "https://h1/search?p=1": True,
    }


def test_duplicate_body_rows_resolve_deterministically(spark):
    """Two fetches for one host collapse to the lexicographically
    smallest body instead of interleaving stanza positions."""
    rows = [
        ("h1", "User-agent: *\nDisallow: /b"),
        ("h1", "User-agent: *\nDisallow: /a"),
    ]
    rules = _rules(spark, rows)
    got = {(r["rule"], r["path"]) for r in rules.collect()}
    assert got == {("disallow", "/a")}


def test_duplicate_input_urls_single_verdict(spark):
    rules = _rules(spark, [("h1", "User-agent: *\nDisallow: /x")])
    from htmlparser2_spark.operators.robots import evaluate_robots

    u = spark.createDataFrame(
        [("https://h1/x",), ("https://h1/x",)], "url string"
    )
    out = evaluate_robots(u, rules, "bot").collect()
    assert len(out) == 1 and out[0]["allowed"] is False


def test_sitemap_directive_extraction(spark):
    """Sitemap: is group-independent (RFC 9309 §2.3) and its URL value
    contains colons — only the first colon splits field from value."""
    from htmlparser2_spark.operators.robots import sitemap_urls

    body = (
        "Sitemap: https://h1/s-top.xml\n"
        "User-agent: *\nDisallow: /x\n"
        "sitemap: https://h1/s-mid.xml  # trailing comment\n"
        "Sitemap:\n"  # empty value ignored
    )
    df = spark.createDataFrame([("h1", body)], "host string, body string")
    got = {r["sitemap_url"] for r in sitemap_urls(df).collect()}
    assert got == {"https://h1/s-top.xml", "https://h1/s-mid.xml"}


def test_sitemap_urls_duplicate_fetch_consistency(spark):
    """sitemap_urls reads the same min-body per host as parse_robots,
    and repeated directives dedupe."""
    from htmlparser2_spark.operators.robots import sitemap_urls

    rows = [
        ("h1", "Sitemap: https://h1/b.xml"),
        ("h1", "Sitemap: https://h1/a.xml\nSitemap: https://h1/a.xml"),
    ]
    df = spark.createDataFrame(rows, "host string, body string")
    got = [tuple(r) for r in sitemap_urls(df).collect()]
    # min(body) is the 'Sitemap: https://h1/a.xml\n...' body
    assert got == [("h1", "https://h1/a.xml")]


def test_meta_robots_flags_semantics(spark):
    """Directive union across multiple metas, 'none' implying both,
    case/whitespace tolerance, distractor metas ignored, and html-less
    pages surviving via the page-universe join."""
    from pyspark.sql import functions as F

    from htmlparser2_spark.operators.domquery import explode_nodes
    from htmlparser2_spark.operators.robots import meta_robots_flags

    rows = [
        ("u0", "<head><meta name='description' content='noindex'></head>"),
        ("u1", "<head><meta name='robots' content='noindex'>"
               "<meta name='googlebot' content='nofollow'></head>"),
        ("u2", "<head><meta name='ROBOTS' content=' INDEX , NoFollow '>"
               "</head>"),
        ("u3", "<head><meta name='robots' content='none'></head>"),
        ("u4", None),  # no DOM rows at all
        ("u5", "<head><meta name='robots'></head>"),  # no content attr
    ]
    pages = spark.createDataFrame(rows, "url string, html string")
    nodes = explode_nodes(pages)
    got = {
        r["url"]: (r["noindex"], r["nofollow"], r["admitted"])
        for r in meta_robots_flags(nodes, pages).collect()
    }
    assert got == {
        "u0": (False, False, True),   # description meta is not robots
        "u1": (True, True, False),    # OR union across two metas
        "u2": (False, True, True),    # case + whitespace tolerant
        "u3": (True, True, False),    # none implies both
        "u4": (False, False, True),   # html-less page still admitted
        "u5": (False, False, True),   # missing content -> no directive
    }


def test_evaluate_robots_inpath_wildcards(spark):
    """RFC 9309 in-path '*': 0+ of any character, composable with the
    '$' anchor; regex metacharacters in rules stay literal; longest
    RULE text wins precedence; wildcard-free hosts are unaffected."""
    from htmlparser2_spark.operators.robots import (
        evaluate_robots,
        parse_robots,
    )

    body = (
        "User-agent: *\n"
        "Disallow: /private*/x\n"
        "Disallow: /*.pdf$\n"
        "Disallow: /a.b\n"
        "Allow: /private-open*/x\n"
    )
    robots = spark.createDataFrame([("h1", body)], "host string, body string")
    rules = parse_robots(robots)
    urls = spark.createDataFrame(
        [
            ("https://h1/private1/x",),        # wildcard disallow
            ("https://h1/private/deep/x",),    # '*' spans slashes
            ("https://h1/private1/y",),        # suffix differs -> allowed
            ("https://h1/doc.pdf",),           # '*' + '$' anchor
            ("https://h1/doc.pdf?x=1",),       # query defeats the '$'
            ("https://h1/doc.pdfx",),          # anchor enforced
            ("https://h1/a.b",),               # literal rule still works
            ("https://h1/aXb",),               # '.' stayed literal
            ("https://h1/private-open1/x",),   # longer Allow rule wins
        ],
        "url string",
    )
    got = {r["url"]: r["allowed"] for r in evaluate_robots(urls, rules, "bot").collect()}
    assert got == {
        "https://h1/private1/x": False,
        "https://h1/private/deep/x": False,
        "https://h1/private1/y": True,
        "https://h1/doc.pdf": False,
        "https://h1/doc.pdf?x=1": True,
        "https://h1/doc.pdfx": True,
        "https://h1/a.b": False,
        "https://h1/aXb": True,
        "https://h1/private-open1/x": True,
    }
