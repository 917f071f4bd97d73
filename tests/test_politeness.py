"""Token-bucket semantics tests — mirror of the reference's throttle tests
(tests/workers/test_tokenbucket.py:56-210): doubling with cap, halving with
floor, drain on throttle, status classification precedence."""

from europarl_crawler_ray.state.politeness import (
    THROTTLE_CAP_FACTOR,
    TokenBucket,
    RobotsGate,
    classify_statuses,
)


def test_throttle_doubles_and_caps():
    b = TokenBucket(min_interval=3.0)
    assert b.interval == 3.0
    for _ in range(20):
        b.throttle()
    assert b.interval == 3.0 * THROTTLE_CAP_FACTOR
    b.throttle()
    assert b.interval == 3.0 * THROTTLE_CAP_FACTOR  # capped


def test_unthrottle_halves_and_floors():
    b = TokenBucket(min_interval=3.0)
    b.throttle()
    b.throttle()
    assert b.interval == 12.0
    b.unthrottle()
    assert b.interval == 6.0
    b.unthrottle()
    b.unthrottle()
    assert b.interval == 3.0  # floored at min


def test_throttle_drains_bucket():
    b = TokenBucket(min_interval=1.0)
    b.tokens = 50
    b.throttle()
    assert b.tokens == 0


def test_classification_precedence():
    # rate-limit beats server-error beats success (tokenbucket.py:80-100)
    assert classify_statuses([200, 429]) == "throttle"
    assert classify_statuses([200, 502]) == "throttle"
    assert classify_statuses([460, 200, 404]) == "throttle"
    assert classify_statuses([200, 404]) == "unthrottle"
    assert classify_statuses([404]) == "unthrottle"
    assert classify_statuses([301, 302]) == "none"
    assert classify_statuses([]) == "none"
    # 599 is EXCLUDED by the reference's range(500, 599)
    assert classify_statuses([599]) == "none"
    assert classify_statuses([598]) == "throttle"


def test_acquire_refill():
    b = TokenBucket(min_interval=1.0, capacity=10)
    b.refill(now=0.0)
    assert b.acquire(5, now=0.0) == 0  # nothing accrued yet
    assert b.acquire(5, now=3.0) == 3
    assert b.acquire(100, now=20.0) == 10  # capacity-capped


def test_interval_evolution_through_coordinator(ray_session):
    """End-to-end adaptive sequence through the coordinator actor with the
    reference's CHECK-WINDOW cadence (tokenbucket.py:102-122): statuses
    accumulate and one (un)throttle decision is made per
    interval × throttling_factor window — a burst of bad batches inside
    one window doubles the interval ONCE, not once per batch."""
    import ray

    from europarl_crawler_ray.state.politeness import PolitenessCoordinator

    c = PolitenessCoordinator.options(num_cpus=0).remote(
        min_interval=3.0, simulated=True, throttling_factor=10.0
    )
    # first report only opens the window
    ray.get(c.report.remote("h", [429]))
    assert ray.get(c.intervals.remote())["h"] == 3.0
    # three bad batches inside one window → ONE doubling at the check
    ray.get(c.report.remote("h", [500]))
    ray.get(c.report.remote("h", [503]))
    assert ray.get(c.intervals.remote())["h"] == 3.0  # still pending
    ray.get(c.advance_clock.remote(31.0))
    ray.get(c.report.remote("h", [429]))  # window passed → apply once
    assert ray.get(c.intervals.remote())["h"] == 6.0
    # good statuses in the next window → one halving back to the floor
    ray.get(c.advance_clock.remote(61.0))
    ray.get(c.report.remote("h", [200, 404]))
    assert ray.get(c.intervals.remote())["h"] == 3.0
    ray.kill(c)


def test_global_rate_caps_aggregate_grants(ray_session):
    """global_rate bounds the SUM of per-host grants (SURVEY §7.3 item 3)."""
    import time as _t

    import ray

    from europarl_crawler_ray.state.politeness import PolitenessCoordinator

    c = PolitenessCoordinator.options(num_cpus=0).remote(
        min_interval=0.001, capacity=10_000, global_rate=50.0, simulated=False
    )
    # prime the host buckets and (via a first nonzero grant) the global one
    ray.get(c.lease.remote("h1", 1))
    ray.get(c.lease.remote("h2", 1))
    _t.sleep(0.2)
    ray.get(c.lease.remote("h1", 10_000))  # primes the global bucket clock
    _t.sleep(0.3)
    g1 = ray.get(c.lease.remote("h1", 10_000))
    g2 = ray.get(c.lease.remote("h2", 10_000))
    # host buckets alone would grant ~300 each; the global bucket caps the
    # SUM at ~global_rate * elapsed (generous upper bound for timing noise)
    assert g1 + g2 <= 50.0 * 1.0, (g1, g2)
    assert g1 >= 1  # something was granted through the global budget
    ray.kill(c)


def test_robots_gate():
    g = RobotsGate()
    g.load("h", "User-agent: *\nDisallow: /private/\nAllow: /private/pub\n")
    assert g.allowed("h", "/public/x")
    assert not g.allowed("h", "/private/x")
    assert g.allowed("h", "/private/pub/x")  # longest prefix wins
    g.load("empty", None)
    assert g.allowed("empty", "/anything")
    assert g.known("h") and g.known("empty") and not g.known("other")
    # RFC 9309 wildcards: '*' matches any run, trailing '$' anchors
    g.load("w", "User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp*\n")
    assert not g.allowed("w", "/doc/report.pdf")
    assert g.allowed("w", "/doc/report.pdf.html")  # $ anchored
    assert not g.allowed("w", "/tmp/x")
    assert g.allowed("w", "/docs/tmp")  # pattern is anchored at path start
