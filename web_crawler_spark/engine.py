"""The distributed crawl engine: FIFO-BFS as batch DataFrame scheduling rounds.

The reference's sequential loop (``Crawler/crawler.py:619-645``) becomes, per
round (SURVEY.md §3.1):

    pending frontier → politeness-budget selection (FIFO chunk / per-host
    quota) → robots gate (broadcast rules, pandas UDF) → fetch+parse
    (mapInPandas over the synthetic web; salt-spread partitions) → append
    crawl_log + links → explode children → within-batch first-occurrence dedup
    (window) → [bloom prefilter] → exact anti-join seen → scalable global rank
    in (parent_seq, link_idx) order → page-cap admission → assign seq → append
    seen, overwrite pending frontier → metrics

Every admission gets a dense global ``seq`` equal to the reference's FIFO
enqueue order, so output ordered by ``seq`` reproduces the reference crawl
ordering exactly (golden-tested against core/oracle.py). The page cap binds at
admission (``len(visited) < max_pages`` at enqueue, crawler.py:556-557), the
robots gate fires after scheduling (crawler.py:502-504), and failed fetches
stay in the seen set — all reference quirks preserved.

Scale notes (the 10^10-frontier design):
- pending/seen live in snapshot tables hash-partitioned by (host_bucket, salt);
  one atomic commit per table per round ⇒ resume-from-checkpoint.
- the only global-order operation is admission ranking; it is a two-phase rank
  (range partition → partition sizes → offset + local row_number), never a
  single-partition window.
- the seen anti-join is the dominant shuffle; the broadcast bloom prefilter
  routes definitely-new candidates around it (false positives only cost time —
  the exact anti-join remains the source of truth).
- politeness is a virtual-clock budget (the reference sleeps ``delay`` seconds
  between requests, crawler.py:637-638 ⇒ ≤ round_seconds/delay fetches per
  round), so ordering is timing-independent and reproducible.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import RunState, SnapshotTable
from .config import JobConfig
from .core.robots import RulesByHost
from .core.webgen import WebConfig
from .functions import udfs
from .functions.filters import BloomFilter64
from .schemas import (
    FRONTIER_SCHEMA,
    N_HOST_BUCKETS,
    N_SALTS,
    OUTCOMES_SCHEMA,
    SEEN_SCHEMA,
)

TABLES = ("frontier", "seen", "crawl_log", "links", "outcomes", "metrics")


@dataclass
class CrawlRun:
    job: JobConfig
    storage_dir: str
    tables: dict[str, SnapshotTable]
    state: RunState
    rounds: int = 0

    def read(self, spark: SparkSession, name: str) -> Optional[DataFrame]:
        return self.tables[name].read(spark)


def _tables(storage_dir: str) -> dict[str, SnapshotTable]:
    return {t: SnapshotTable(storage_dir, t) for t in TABLES}


def global_rank(df: DataFrame, order_cols: list[str], rank_col: str) -> DataFrame:
    """Dense 1-based global rank in (order_cols) order — scalably.

    Two-phase: range-partition + sort by the order columns, freeze the
    partitioning (persist), compute per-partition sizes (tiny collect), then
    rank = partition offset + intra-partition row_number. No single-partition
    window anywhere, so this survives a 10^10-row candidate set; ties are
    impossible because (parent_seq, link_idx) is unique by construction.
    """
    part = (
        df.repartitionByRange(*order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    sizes = {r["_pid"]: r["cnt"] for r in part.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets = {}
    acc = 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    if offsets:
        omap = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
        offset_expr = omap[F.col("_pid")]
    else:  # empty input — rank column is never read but must typecheck
        offset_expr = F.lit(0).cast("long")
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        part.withColumn(rank_col, F.row_number().over(w) + offset_expr)
        .drop("_pid")
    )


def _frontier_row_cols(df: DataFrame, round_added: int) -> DataFrame:
    """Attach partitioning/bookkeeping columns to (url, seq, depth, parent_seq,
    link_idx) rows → full FRONTIER_SCHEMA."""
    return (
        df.withColumn("host", F.parse_url(F.col("url"), F.lit("HOST")))
        .withColumn("host", F.coalesce("host", F.lit("")))
        .withColumn("url_hash", F.xxhash64("url"))
        .withColumn("host_bucket", F.pmod(F.xxhash64("host"), F.lit(N_HOST_BUCKETS)).cast("int"))
        .withColumn("salt", F.pmod(F.xxhash64("url"), F.lit(N_SALTS)).cast("int"))
        .withColumn("attempt", F.lit(0))
        .withColumn("round_added", F.lit(round_added))
        .select([f.name for f in FRONTIER_SCHEMA.fields])
    )


def politeness_budget(job: JobConfig, round_seconds: float = 60.0) -> Optional[int]:
    """Virtual-clock budget: fetches allowed per scheduling round.

    The reference enforces one global ``sleep(delay)`` between requests
    (crawler.py:637-638) ⇒ at most round_seconds/delay fetches per round.
    delay == 0 ⇒ unbounded (None).
    """
    if job.delay <= 0:
        return None
    return max(1, int(round_seconds / job.delay))


def crawl(
    spark: SparkSession,
    job: JobConfig,
    cfg: WebConfig,
    rules: RulesByHost,
    storage_dir: str,
    budget: Optional[int] = None,
    politeness_mode: str = "global",  # 'global' (reference-exact) | 'per_host'
    use_bloom: bool = False,
    resume: bool = False,
    max_rounds: int = 10_000,
    fetch_partitions: Optional[int] = None,
) -> CrawlRun:
    """Run (or resume) a crawl job to fixpoint. See module docstring."""
    job.validate()
    os.makedirs(storage_dir, exist_ok=True)
    tables = _tables(storage_dir)
    state_store = RunState(storage_dir)
    run = CrawlRun(job=job, storage_dir=storage_dir, tables=tables, state=state_store)

    jid = F.lit(job.job_id)
    P = fetch_partitions or spark.conf.get("spark.sql.shuffle.partitions")
    P = int(P)

    if resume and (state := state_store.load()):
        # roll back any table snapshot committed after the last full round
        for t in tables.values():
            t.rollback_to_round(state["round"])
        rnd, next_seq, seen_count = state["round"], state["next_seq"], state["seen_count"]
    else:
        # round 0: seed the frontier and the seen set (crawler.py:611-612 —
        # the start URL is admitted as-is, uncanonicalized)
        seed = spark.createDataFrame(
            [(job.job_id, 0, job.start_url, 0, -1, -1)],
            "job_id int, seq long, url string, depth int, parent_seq long, link_idx int",
        )
        seed_f = _frontier_row_cols(seed, 0)
        tables["frontier"].write(seed_f, 0, mode="overwrite")
        tables["seen"].write(
            seed_f.select("job_id", "url_hash", "url", "seq", F.lit(0).alias("round_added")),
            0,
        )
        rnd, next_seq, seen_count = 0, 1, 1
        state_store.save({"round": 0, "next_seq": 1, "seen_count": 1})

    gate_udf = F.pandas_udf(udfs.make_robots_gate(rules, job.user_agent), "boolean")
    fetch_fn = udfs.make_fetch_parse(cfg, job)

    while rnd < max_rounds:
        rnd += 1
        pending = tables["frontier"].read(spark, schema=FRONTIER_SCHEMA)
        if pending is None:
            break

        # ---- politeness selection (FIFO chunk or per-host quota) ----------
        if budget is None:
            scheduled, remaining = pending, None
        elif politeness_mode == "global":
            scheduled = pending.orderBy("seq").limit(budget)
            remaining = pending.join(scheduled.select("seq"), "seq", "left_anti")
        else:  # per_host: window rank within host bucket by priority (seq)
            w = Window.partitionBy("host").orderBy("seq")
            ranked = pending.withColumn("_hr", F.row_number().over(w))
            scheduled = ranked.filter(F.col("_hr") <= budget).drop("_hr")
            remaining = ranked.filter(F.col("_hr") > budget).drop("_hr")

        # ---- robots gate (broadcast rules; fail-open) ----------------------
        gated = scheduled.withColumn("_allowed", gate_udf(F.col("url"))).persist()
        n_scheduled = gated.count()
        if n_scheduled == 0:
            gated.unpersist()
            break
        disallowed = gated.filter(~F.col("_allowed"))
        to_fetch = gated.filter(F.col("_allowed"))

        # ---- fetch + parse (salt-spread partitions defeat hot-host skew) ---
        fetched_df = to_fetch.repartition(P, "host_bucket", "salt").mapInPandas(
            fetch_fn, udfs.FETCHED_SCHEMA
        )
        # materialize ONCE per round; every downstream output derives from the
        # stage file (lineage truncation — the iterative-Spark essential)
        stage_path = os.path.join(storage_dir, f"_stage_round_{rnd}")
        fetched_df.write.mode("overwrite").parquet(stage_path)
        fetched = spark.read.schema(udfs.FETCHED_SCHEMA).parquet(stage_path)

        # ---- outcomes (lineage) -------------------------------------------
        outc = fetched.select(
            jid.alias("job_id"), F.lit(rnd).alias("round"), "seq", "url", "depth",
            "outcome", "status_code", "attempts", "fetch_latency_ms",
        ).unionByName(
            disallowed.select(
                jid.alias("job_id"), F.lit(rnd).alias("round"), "seq", "url", "depth",
                F.lit("disallowed").alias("outcome"),
                F.lit(None).cast("int").alias("status_code"),
                F.lit(0).alias("attempts"), F.lit(0.0).alias("fetch_latency_ms"),
            )
        )
        tables["outcomes"].write(outc.select([f.name for f in OUTCOMES_SCHEMA.fields]), rnd)

        parsed = fetched.filter(F.col("outcome") == "parsed")

        # ---- crawl_log + links appends ------------------------------------
        tables["crawl_log"].write(
            parsed.select(
                jid.alias("job_id"), F.lit(rnd).alias("round"),
                F.col("seq").alias("schedule_rank"), F.col("page_url").alias("url"),
                "depth", "status_code", "title", "metadata", "headings", "content",
                F.struct(F.col("image_id"), F.col("caption")).alias("payload"),
            ),
            rnd,
        )
        links_df = parsed.select(
            jid.alias("job_id"), F.col("page_url").alias("from_url"),
            F.col("depth").alias("from_depth"), F.col("seq").alias("parent_seq"),
            F.explode("links").alias("l"),
        ).select(
            "job_id", "from_url", F.col("l.to_url").alias("to_url"),
            F.coalesce(F.col("l.link_text"), F.lit("")).alias("link_text"),
            F.col("l.link_idx").alias("link_idx"), "from_depth", "parent_seq",
        )
        tables["links"].write(
            links_df.select("job_id", "from_url", "to_url", "link_text", "link_idx", "from_depth"),
            rnd,
        )

        # ---- candidate children → dedup → anti-join seen → admission -------
        n_admit_room = job.max_pages - seen_count
        admitted_count = 0
        if n_admit_room > 0:
            candidates = (
                links_df.filter(F.col("from_depth") < job.max_depth)
                .select(
                    F.col("to_url").alias("url"),
                    (F.col("from_depth") + 1).alias("depth"),
                    "parent_seq", "link_idx",
                )
            )
            # within-batch first-occurrence dedup (crawler.py:429-430 analog
            # across pages: the earliest (parent_seq, link_idx) wins the slot)
            wdup = Window.partitionBy("url").orderBy("parent_seq", "link_idx")
            fresh = candidates.withColumn("_rn", F.row_number().over(wdup)).filter(
                F.col("_rn") == 1
            ).drop("_rn")

            seen_df = tables["seen"].read(spark, schema=SEEN_SCHEMA)
            if use_bloom:
                bloom = _build_bloom(seen_df, seen_count)
                bcast = spark.sparkContext.broadcast(bloom.to_bytes())
                k = bloom.k

                def might_contain(h):
                    import pandas as pd

                    f = BloomFilter64.from_bytes(bcast.value, k)
                    return pd.Series(f.might_contain(h.to_numpy()))

                mc_udf = F.pandas_udf(might_contain, "boolean")
                fresh = fresh.withColumn("_mc", mc_udf(F.xxhash64("url")))
                # bloom says definitely-new → bypass the anti-join shuffle
                surely_new = fresh.filter(~F.col("_mc")).drop("_mc")
                maybe_seen = fresh.filter(F.col("_mc")).drop("_mc")
                new_urls = surely_new.unionByName(
                    maybe_seen.join(seen_df.select(F.col("url").alias("_su")),
                                    F.col("url") == F.col("_su"), "left_anti")
                )
            else:
                new_urls = fresh.join(
                    seen_df.select(F.col("url").alias("_su")),
                    F.col("url") == F.col("_su"), "left_anti",
                )

            ranked = global_rank(new_urls, ["parent_seq", "link_idx"], "_adm")
            admitted = (
                ranked.filter(F.col("_adm") <= n_admit_room)
                .withColumn("seq", F.lit(next_seq) + F.col("_adm") - 1)
                .drop("_adm")
                .withColumn("job_id", jid)
            )
            admitted_f = _frontier_row_cols(
                admitted.select("job_id", "seq", "url", "depth", "parent_seq", "link_idx"),
                rnd,
            ).persist()
            admitted_count = admitted_f.count()
            if admitted_count:
                tables["seen"].write(
                    admitted_f.select(
                        "job_id", "url_hash", "url", "seq",
                        F.lit(rnd).alias("round_added"),
                    ),
                    rnd,
                )

        # ---- next pending frontier (atomic overwrite) -----------------------
        next_pending_parts = []
        if remaining is not None:
            next_pending_parts.append(remaining)
        if admitted_count:
            next_pending_parts.append(admitted_f)
        if next_pending_parts:
            np_df = next_pending_parts[0]
            for p in next_pending_parts[1:]:
                np_df = np_df.unionByName(p)
            tables["frontier"].write(np_df, rnd, mode="overwrite")
            has_next = True
        else:
            tables["frontier"].write(
                spark.createDataFrame([], FRONTIER_SCHEMA), rnd, mode="overwrite"
            )
            has_next = False

        # ---- metrics / lineage per (round, partition, host_bucket) ---------
        metrics = (
            fetched.withColumn("partition_id", F.spark_partition_id())
            .groupBy("host_bucket", "partition_id")
            .agg(
                F.count("*").alias("rows_in"),
                F.sum(F.when(F.col("outcome") == "parsed", 1).otherwise(0)).alias("rows_out"),
                F.percentile_approx("fetch_latency_ms", 0.5).alias("latency_p50_ms"),
                F.percentile_approx("fetch_latency_ms", 0.95).alias("latency_p95_ms"),
                F.collect_list(F.floor(F.col("fetch_latency_ms") / 100)).alias("_bk"),
            )
            .select(
                jid.alias("job_id"), F.lit(rnd).alias("round"), "partition_id",
                "host_bucket", "rows_in", "rows_out", "latency_p50_ms", "latency_p95_ms",
                F.transform(
                    F.sequence(F.lit(0), F.lit(9)),
                    lambda b: F.size(F.filter(F.col("_bk"), lambda x: x == b.cast("bigint"))).cast("bigint"),
                ).alias("latency_hist"),
            )
        )
        tables["metrics"].write(metrics, rnd)

        # ---- commit round state (the resume point) -------------------------
        next_seq += admitted_count
        seen_count += admitted_count
        state_store.save({"round": rnd, "next_seq": next_seq, "seen_count": seen_count})
        gated.unpersist()
        run.rounds = rnd
        if not has_next:
            break

    return run


def _build_bloom(seen_df: DataFrame, seen_count: int) -> BloomFilter64:
    """2-phase bloom build: per-partition numpy bitmaps via mapInPandas,
    OR-reduced on the driver. Bitmap size is O(seen capacity), independent of
    partition count."""
    import pandas as pd

    capacity = max(1024, seen_count * 2)
    proto = BloomFilter64(capacity)
    n_bits, k = proto.n_bits, proto.k

    def partition_bitmap(batches):
        f = BloomFilter64.__new__(BloomFilter64)
        import numpy as np

        f.n_bits, f.k = n_bits, k
        f.bits = np.zeros(n_bits // 8, dtype=np.uint8)
        for pdf in batches:
            if len(pdf):
                f.add(pdf["url_hash"].to_numpy())
        yield pd.DataFrame({"bitmap": [f.to_bytes()]})

    parts = (
        seen_df.select("url_hash")
        .mapInPandas(partition_bitmap, "bitmap binary")
        .collect()
    )
    out = proto
    for r in parts:
        import numpy as np

        out.merge(BloomFilter64.from_bytes(bytes(r["bitmap"]), k))
    return out
