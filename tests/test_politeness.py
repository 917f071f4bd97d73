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
    """End-to-end adaptive sequence through the coordinator actor: exact
    doubling on bad statuses, halving on good, floor at min_interval."""
    import ray

    from europarl_crawler_ray.state.politeness import PolitenessCoordinator

    c = PolitenessCoordinator.options(num_cpus=0).remote(min_interval=3.0, simulated=True)
    seq = [([429], 6.0), ([500], 12.0), ([503, 200], 24.0), ([200], 12.0),
           ([404], 6.0), ([404], 3.0), ([200], 3.0), ([301], 3.0)]
    for statuses, expected in seq:
        ray.get(c.report.remote("h", statuses))
        assert ray.get(c.intervals.remote())["h"] == expected, (statuses, expected)
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
