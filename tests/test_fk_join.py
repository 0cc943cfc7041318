"""FK-join update-propagation vectors — modeled on the reference's
ResponsiveForeignKeyJoinIntegrationTest.java:199-238 expectations:
right-side updates fan out to all referencing left rows; a left row whose
FK changes moves between right keys (unsubscribe + resubscribe); tombstones
retract."""

from __future__ import annotations

from pyspark.sql import functions as F

from responsive_pub_spark.operators import fk_join


def _changelog(spark, left_rows, right_rows):
    left = spark.createDataFrame(
        left_rows, "user STRING, team STRING, name STRING, ts DOUBLE"
    )
    right = spark.createDataFrame(right_rows, "team STRING, org STRING, ts DOUBLE")
    return fk_join.fk_join_changelog(
        left,
        right,
        left_key="user",
        fk="team",
        right_key="team",
        left_payload=F.col("name"),
        right_payload=F.col("org"),
        ts_col="ts",
    )


def test_right_update_fans_out_to_all_subscribers(spark):
    chg = _changelog(
        spark,
        [
            ("u1", "blue", "alice", 1.0),
            ("u2", "blue", "bob", 2.0),
            ("u3", "red", "carol", 3.0),
        ],
        [
            ("blue", "acme", 0.0),
            ("red", "globex", 0.0),
            ("blue", "acme-v2", 10.0),  # update AFTER subscriptions exist
        ],
    ).collect()
    # the blue update at t=10 re-emitted BOTH blue subscribers
    fanout = [(r.left_key, r.right_payload) for r in chg if r.ts_sec == 10]
    assert sorted(fanout) == [("u1", "acme-v2"), ("u2", "acme-v2")]
    snap = {
        r.left_key: (r.left_payload, r.right_payload)
        for r in fk_join.fk_join_snapshot(
            _changelog(
                spark,
                [
                    ("u1", "blue", "alice", 1.0),
                    ("u2", "blue", "bob", 2.0),
                    ("u3", "red", "carol", 3.0),
                ],
                [
                    ("blue", "acme", 0.0),
                    ("red", "globex", 0.0),
                    ("blue", "acme-v2", 10.0),
                ],
            )
        ).collect()
    }
    assert snap == {
        "u1": ("alice", "acme-v2"),
        "u2": ("bob", "acme-v2"),
        "u3": ("carol", "globex"),
    }


def test_fk_change_moves_subscription(spark):
    """u1 moves blue -> red: must stop receiving blue updates and start
    receiving red's value (the subscription-topic re-key)."""
    chg = _changelog(
        spark,
        [
            ("u1", "blue", "alice", 1.0),
            ("u1", "red", "alice", 5.0),  # FK transition
        ],
        [
            ("blue", "acme", 0.0),
            ("red", "globex", 0.0),
            ("blue", "acme-v2", 10.0),  # after the move: must NOT reach u1
        ],
    )
    rows = chg.collect()
    # no emission for u1 carries the post-move blue update
    assert not any(r.right_payload == "acme-v2" for r in rows)
    snap = {r.left_key: (r.left_payload, r.right_payload)
            for r in fk_join.fk_join_snapshot(chg).collect()}
    assert snap == {"u1": ("alice", "globex")}


def test_left_tombstone_retracts(spark):
    chg = _changelog(
        spark,
        [
            ("u1", "blue", "alice", 1.0),
            ("u1", "blue", None, 5.0),  # tombstone: null payload deletes
        ],
        [("blue", "acme", 0.0), ("blue", "acme-v2", 10.0)],
    )
    rows = chg.collect()
    # post-tombstone right update fans out to nobody
    assert not any(r.right_payload == "acme-v2" for r in rows)
    assert fk_join.fk_join_snapshot(chg).collect() == []


def test_subscribe_before_right_exists_then_right_arrives(spark):
    """Left arrives first (right row missing -> null join), right arrives
    later and back-fills — the bidirectional propagation direction the
    plain equi-join recompute cannot express incrementally."""
    chg = _changelog(
        spark,
        [("u1", "blue", "alice", 1.0)],
        [("blue", "acme", 5.0)],  # right arrives AFTER the subscription
    )
    rows = sorted(chg.collect(), key=lambda r: r.ts_sec)
    assert [(r.ts_sec, r.right_payload) for r in rows] == [(1, None), (5, "acme")]
    snap = fk_join.fk_join_snapshot(chg).collect()
    assert [(r.left_key, r.right_payload) for r in snap] == [("u1", "acme")]


def test_salted_changelog_identical_to_unsalted(spark):
    """FK-skew mitigation: salting the subscription store must not change a
    single changelog emission (each subscription lives in exactly one salt;
    right updates replicate to all salts)."""
    left_rows = [
        ("u1", "blue", "alice", 1.0),
        ("u2", "blue", "bob", 2.0),
        ("u3", "blue", "carol", 3.0),
        ("u4", "red", "dave", 4.0),
        ("u2", "red", "bob2", 5.0),  # FK move off the hot key
        ("u3", None, None, 6.0),     # tombstone
    ]
    right_rows = [
        ("blue", "acme", 0.0),
        ("red", "globex", 0.0),
        ("blue", "acme-v2", 10.0),   # hot-key fan-out
        ("red", None, 11.0),         # right tombstone fan-out
    ]
    left = spark.createDataFrame(
        left_rows, "user STRING, team STRING, name STRING, ts DOUBLE"
    )
    right = spark.createDataFrame(right_rows, "team STRING, org STRING, ts DOUBLE")

    def run(n_salts):
        # engine pinned to the processor: salting is a processor-lane
        # mitigation and declarative+salts now raises (ADVICE r2)
        rows = fk_join.fk_join_changelog(
            left, right, left_key="user", fk="team", right_key="team",
            left_payload=F.col("name"), right_payload=F.col("org"),
            ts_col="ts", n_salts=n_salts, engine="processor",
        ).collect()
        emissions = [
            (r.left_key, r.left_payload, r.right_payload, r.ts_sec) for r in rows
        ]
        return sorted(emissions, key=lambda t: tuple("" if x is None else str(x) for x in t))

    assert run(1) == run(4)


def test_fk_to_null_on_live_row_unsubscribes(spark):
    """ADVICE r1: a live left row whose FK becomes NULL must unsubscribe
    from the old FK (null-safe compare in the batch stage-0); otherwise a
    stale subscription keeps receiving the old FK's fan-outs."""
    chg = _changelog(
        spark,
        [
            ("u1", "blue", "alice", 1.0),
            ("u1", None, "alice2", 5.0),  # live row, FK -> NULL
        ],
        [("blue", "acme", 0.0), ("blue", "acme-v2", 10.0)],
    )
    rows = chg.collect()
    # the post-transition blue update must fan out to nobody
    assert not any(r.right_payload == "acme-v2" for r in rows)
    # inner snapshot: u1 has no right match any more
    assert fk_join.fk_join_snapshot(chg).collect() == []
    # left snapshot keeps the live row with NULL right side
    snap = {r.left_key: (r.left_payload, r.right_payload)
            for r in fk_join.fk_join_snapshot(chg, inner=False).collect()}
    assert snap == {"u1": ("alice2", None)}


def test_declarative_stage1_equals_processor_on_events(spark, sf_dir):
    """Referee: the all-JVM batch stage 1 must emit EXACTLY the processor's
    changelog (same multiset of emissions) on the real events fixture —
    FK moves, tombstones, and fan-outs included."""
    from responsive_pub_spark.sources.readers import read_table

    # ts stays a raw timestamp_ntz here on purpose: fk_join must convert
    # timestamp-typed event time itself (portable.ts_to_double)
    ev = read_table(spark, sf_dir, "events")
    left = ev.select("user_id", "event_type", "event_id", "ts")
    right = (
        ev.groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .withColumn("ts", F.lit(0.0))
    )

    def run(engine):
        rows = fk_join.fk_join_changelog(
            left, right, left_key="user_id", fk="event_type",
            right_key="event_type",
            left_payload=F.concat_ws("#", "event_type", "event_id"),
            right_payload=F.col("n").cast("string"),
            ts_col="ts", engine=engine,
        ).collect()
        emissions = [
            (r.left_key, r.left_payload, r.right_payload, r.ts_sec)
            for r in rows
        ]
        return sorted(
            emissions, key=lambda t: tuple("" if x is None else str(x) for x in t)
        )

    assert run("declarative") == run("processor")


def test_declarative_stage1_equals_processor_randomized(spark):
    """Seeded-random referee for the declarative stage 1: random left/right
    changelogs over small key domains (maximizing FK moves, tombstones,
    same-instant collisions and interleavings), declarative emissions must
    equal processor emissions exactly."""
    import random

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        users = [f"u{i}" for i in range(6)]
        fks = [f"k{i}" for i in range(3)]
        left_rows, right_rows = [], []
        for t in range(40):
            u = rng.choice(users)
            # tombstone 15%, FK->NULL 10%, else random FK
            r = rng.random()
            if r < 0.15:
                left_rows.append((u, rng.choice(fks), None, float(t)))
            elif r < 0.25:
                left_rows.append((u, None, f"p{t}", float(t)))
            else:
                left_rows.append((u, rng.choice(fks), f"p{t}", float(t)))
            if rng.random() < 0.4:
                k = rng.choice(fks)
                # right tombstone 20%
                v = None if rng.random() < 0.2 else f"r{t}"
                right_rows.append((k, v, float(t) + rng.choice((0.0, 0.5))))
        left = spark.createDataFrame(
            left_rows, "user STRING, team STRING, name STRING, ts DOUBLE"
        )
        right = spark.createDataFrame(
            right_rows, "team STRING, org STRING, ts DOUBLE"
        )

        def run(engine):
            rows = fk_join.fk_join_changelog(
                left, right, left_key="user", fk="team", right_key="team",
                left_payload=F.col("name"), right_payload=F.col("org"),
                ts_col="ts", engine=engine,
            ).collect()
            emissions = [
                (r.left_key, r.left_payload, r.right_payload, r.ts_sec)
                for r in rows
            ]
            return sorted(
                emissions,
                key=lambda t: tuple("" if x is None else str(x) for x in t),
            )

        assert run("declarative") == run("processor"), f"seed {seed} diverged"


def test_engine_and_salt_arg_validation(spark):
    """ADVICE r2: engine='declarative' + n_salts>1 used to silently run the
    processor (landing the caller back on the Python throughput ceiling);
    unknown engine strings were accepted silently. Both now raise."""
    import pytest

    left = spark.createDataFrame(
        [("u1", "blue", "alice", 1.0)],
        "user STRING, team STRING, name STRING, ts DOUBLE",
    )
    right = spark.createDataFrame([("blue", "acme", 0.0)], "team STRING, org STRING, ts DOUBLE")
    kw = dict(
        left_key="user", fk="team", right_key="team",
        left_payload=F.col("name"), right_payload=F.col("org"), ts_col="ts",
    )
    with pytest.raises(ValueError, match="processor"):
        fk_join.fk_join_changelog(left, right, n_salts=4, **kw)
    with pytest.raises(ValueError, match="engine"):
        fk_join.fk_join_changelog(left, right, engine="magic", **kw)
    # the sanctioned combination still works
    assert fk_join.fk_join_changelog(
        left, right, n_salts=2, engine="processor", **kw
    ).count() == 1
