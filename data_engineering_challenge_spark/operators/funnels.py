"""Product-analytics compositions over `events`: retention cohorts and
funnel conversion.

North-star extensions beyond the reference surface (the reference's
analytics stop at per-day revenue and store rollups —
`/root/reference/src/db/queries/*.sql`): these are the two queries
every event-warehouse user runs on day one, expressed with the same
exact-arithmetic oracle discipline as the rest of the registry (date
truncation, integer week arithmetic, and one double division per
output row — no float aggregation anywhere).

Scale posture: both queries shuffle on `user_id` only (the natural
event-table key), pre-aggregate to per-user rows before any join, and
produce entity-count-sized outputs (cohort×offset grid, one funnel
row). Catalyst reuses the per-user exchange across the aggregation and
join stages where the keys line up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

FUNNEL_WINDOW_DAYS = 7  # click → purchase attribution window


@register(
    "user_retention_cohorts",
    oracle="""
        WITH firsts AS (
            SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
            FROM events GROUP BY user_id
        ),
        activity AS (
            SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
            FROM events
        )
        SELECT CAST(f.cohort_week AS DATE) AS cohort_week,
               CAST(date_diff('day', f.cohort_week, a.active_week) / 7 AS BIGINT)
                   AS week_offset,
               COUNT(DISTINCT a.user_id) AS n_active
        FROM activity a JOIN firsts f USING (user_id)
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    doc="Weekly retention cohorts: users grouped by the week of their "
    "first event, counted in every subsequent week they were active — "
    "the canonical retention triangle. Week truncation and the "
    "day-difference/7 offset are exact integer/date arithmetic on both "
    "engines (both truncate weeks to Monday). Scale: two per-user "
    "aggregations over one events scan shape, joined on user_id (the "
    "exchange is shared), output is the |cohorts| x |weeks| grid.",
    tags=("window", "relational", "extension"),
)
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            F.col("cohort_week").cast("date").alias("cohort_week"),
            (F.datediff(F.col("active_week"), F.col("cohort_week")) / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "funnel_conversion",
    oracle=f"""
        WITH first_click AS (
            SELECT user_id, MIN(ts) AS click_ts
            FROM events WHERE event_type = 'click' GROUP BY user_id
        ),
        converted AS (
            SELECT DISTINCT c.user_id
            FROM first_click c
            JOIN events p
              ON p.user_id = c.user_id
             AND p.event_type = 'purchase'
             AND p.ts > c.click_ts
             AND p.ts <= c.click_ts + INTERVAL {FUNNEL_WINDOW_DAYS} DAY
        )
        SELECT (SELECT COUNT(*) FROM first_click) AS n_clickers,
               (SELECT COUNT(*) FROM converted) AS n_converted,
               CAST((SELECT COUNT(*) FROM converted) AS DOUBLE)
                   / (SELECT COUNT(*) FROM first_click) AS conversion_rate
    """,
    doc=f"Click-to-purchase funnel: users whose FIRST click is followed "
    f"by a purchase within {FUNNEL_WINDOW_DAYS} days — the attribution "
    "query behind every conversion dashboard. The interval compare is "
    "exact timestamp arithmetic; the single rate division runs once "
    "over two exact counts. Scale: first-click pre-aggregates to one "
    "row per user before the purchase join (both sides shuffle on "
    "user_id once), and the purchase side is filtered to one event "
    "type at the scan (pushed predicate).",
    tags=("relational", "temporal", "extension"),
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    first_click = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    converted = (
        first_click.join(purchases, "user_id")
        .filter(
            (F.col("p_ts") > F.col("click_ts"))
            & (
                F.col("p_ts")
                <= F.col("click_ts") + F.expr(f"INTERVAL {FUNNEL_WINDOW_DAYS} DAY")
            )
        )
        .select("user_id")
        .distinct()
    )
    n_clickers = first_click.agg(F.count(F.lit(1)).alias("n_clickers"))
    n_converted = converted.agg(F.count(F.lit(1)).alias("n_converted"))
    return n_clickers.crossJoin(n_converted).select(
        "n_clickers",
        "n_converted",
        # try_divide: zero clickers (empty funnel) -> NULL rate instead of
        # an ANSI DIVIDE_BY_ZERO; on real data n_clickers > 0 and the
        # result is bit-identical to plain division.
        F.try_divide(F.col("n_converted").cast("double"), F.col("n_clickers")).alias(
            "conversion_rate"
        ),
    )


@register(
    "event_transition_matrix",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   LAG(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_type
            FROM events
        ),
        pairs AS (
            SELECT prev_type, event_type AS next_type,
                   COUNT(*)::BIGINT AS n_transitions
            FROM seq WHERE prev_type IS NOT NULL
            GROUP BY prev_type, event_type
        )
        SELECT prev_type, next_type, n_transitions,
               CAST(n_transitions AS DOUBLE)
                   / CAST(SUM(n_transitions) OVER (PARTITION BY prev_type)
                          AS DOUBLE) AS p_next
        FROM pairs ORDER BY prev_type, next_type
    """,
    doc="First-order Markov transition matrix over per-user event "
    "sequences (the user-journey model behind next-action prediction "
    "and funnel design): LAG within (user, ts, event_id) order, exact "
    "transition counts, row-normalized probabilities via one final "
    "division. One shuffle on user_id for the window, one on "
    "(prev, next) for the count; the matrix itself is "
    "|event_types|^2-sized — constant, never corpus-sized.",
    tags=("events", "window", "extension"),
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(prev_type, next_type, n_transitions, p_next) over per-user
    event sequences."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select(
            "user_id",
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_transitions"))
    )
    wp = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(wp).cast("double")
        ).alias("p_next"),
    ).orderBy("prev_type", "next_type")
