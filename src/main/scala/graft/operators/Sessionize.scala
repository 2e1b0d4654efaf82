package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization over an event stream — batch (window-function
  * formulation) and streaming (flatMapGroupsWithState) variants. The
  * reference has no event-time surface (SURVEY §2.9 R8); this is part of
  * the training-data/stream-analytics extension of the engine. */
object Sessionize {

  /** Batch: assign session ids per user with a max inactivity gap, then
    * aggregate one row per session. Input needs `user_id` and an epoch-
    * micros long column `us`; unique (user_id, us, event_id) assumed for
    * deterministic ordering.
    *
    * The per-user timeline is a DISTRIBUTED prefix scan (same
    * construction as `TextPipeline.tokenBudgetSample`), not a
    * one-partition-per-user window: rows carry a deterministic
    * range-bucket id over (user, us, event_id) ([[RangeBuckets]]) so one
    * pathological user spans many buckets; the cross-bucket lag is
    * reconstructed from a boundary table and local break-count cumsums
    * are lifted by an exclusive-prefix offset. Both correction tables
    * are restricted to the users that actually SPAN a bucket boundary —
    * at most buckets-1 of them regardless of user count — so they
    * broadcast at any scale. Output is invariant to bucket boundaries
    * (spec-pinned at several bucket counts). */
  def batch(events: DataFrame, gapMinutes: Int): DataFrame = {
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    // only the three columns the scan/correction logic touches. pid is
    // a DERIVED range-bucket id — a pure function of the row (see
    // [[RangeBuckets]]) — never spark_partition_id(): Catalyst re-plans
    // each reference to this subtree and RangePartitioner re-samples
    // its bounds per expansion (RDD-id-seeded), so an execution-derived
    // pid let the pid-keyed correction tables disagree with the
    // row-level tree about row placement (observed as spurious session
    // splits/merges). A pure-function pid is consistent across every
    // expansion by construction — nothing needs caching, and the
    // window's own hash exchange on (pid, user) does the distribution.
    // Cost shape (round-10 verdict #4 rework): ONE full shuffle+sort of
    // the event tree total. `scanned` carries the lag, the boundary
    // join, and the running break-count in a single window chain — the
    // broadcast join preserves the window exchange's partitioning and
    // ordering, so the second WindowExec adds no exchange and no sort —
    // and persists NARROW (4 cols) because two consumers (offsets, the
    // final assembly) read it — [[RangeBuckets.maybePersist]], the A/B-
    // switchable self-unpersisting cache the other prefix-scan operators
    // use. `ranged` itself is no longer persisted:
    // pid is a pure row function, so the tiny perPid/bounds chain just
    // re-scans the (column-pruned) input once. The persist is perf-only
    // and self-unpersisting (first completed action drops it) —
    // correctness never depends on it.
    // No Par.ensure: the first real work is the window's own hash
    // exchange on (pid, user), which redistributes regardless of scan
    // parallelism — a pre-repartition would shuffle the input twice.
    val keyed = events.select(col("user_id"), col("us"), col("event_id"))
    val nParts = events.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = keyed.withColumn("pid",
      RangeBuckets.bucketCol(keyed,
        Seq(col("user_id"), col("us"), col("event_id")), nParts))
    val wL = Window.partitionBy("pid", "user_id").orderBy("us", "event_id")
    val wPid = Window.partitionBy("user_id").orderBy("pid")
    // per-(pid, user) summary; users entirely inside one partition need
    // no correction, so both tiny tables keep only the spanning users.
    // The spanning restriction is a count-over-user window on the
    // already-tiny perPid aggregate (≤ users + buckets rows) — a
    // semi-join formulation re-scanned the full input once more just to
    // rebuild perPid for the join's other side.
    val perPid = ranged.groupBy("pid", "user_id").agg(max(col("us")).as("last_us"))
    val bounds = perPid
      .withColumn("np", count(lit(1)).over(Window.partitionBy("user_id")))
      .filter(col("np") > 1)
      .withColumn("prev_last", lag(col("last_us"), 1).over(wPid))
      .select("pid", "user_id", "prev_last")
    val spanning = bounds.select("user_id").distinct()
    // lag -> broadcast bounds -> flag -> running sum: one exchange+sort
    val scanned = ranged
      .withColumn("prev_local", lag(col("us"), 1).over(wL))
      .join(broadcast(bounds), Seq("pid", "user_id"), "left")
      .withColumn("prev_us", coalesce(col("prev_local"), col("prev_last")))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1).otherwise(0))
      .withColumn("lidx",
        sum(col("new_session")).over(wL.rowsBetween(Window.unboundedPreceding, 0)))
      .select("pid", "user_id", "us", "lidx")
      .transform(RangeBuckets.maybePersist) // perf-only (A/B: GRAFT_PREFIX_PERSIST=0)
    // max(lidx) per (pid, user) IS the group's break count — no second
    // pass over new_session needed
    val offsets = scanned.groupBy("pid", "user_id")
      .agg(max(col("lidx")).as("brks"))
      .join(spanning, Seq("user_id"), "left_semi")
      .withColumn("off", coalesce(
        sum(col("brks")).over(wPid.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("pid", "user_id", "off")
    scanned
      .join(broadcast(offsets), Seq("pid", "user_id"), "left")
      .withColumn("session_idx", col("lidx") + coalesce(col("off"), lit(0L)))
      .groupBy("user_id", "session_idx")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"),
        max(col("us")).as("end_us"))
  }

  final case class SessionEvent(userId: Long, us: Long)
  final case class SessionState(start: Long, end: Long, n: Long)
  final case class ClosedSession(userId: Long, startUs: Long, endUs: Long, nEvents: Long)

  /** Streaming: custom state via flatMapGroupsWithState (SURVEY §2.9
    * mapping for KeyValueGroupedDataset state). A session closes when a
    * later event for the same user arrives past the gap (event-time gap
    * closure); open sessions persist in state until then. */
  def streaming(events: Dataset[SessionEvent], gapMinutes: Int): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) => {
          val sorted = rows.toSeq.sortBy(_.us)
          var closed = List.empty[ClosedSession]
          var cur = state.getOption
          sorted.foreach { e =>
            cur match {
              case Some(s) if e.us - s.end <= gapUs =>
                cur = Some(SessionState(s.start, e.us, s.n + 1))
              case Some(s) =>
                closed ::= ClosedSession(userId, s.start, s.end, s.n)
                cur = Some(SessionState(e.us, e.us, 1))
              case None =>
                cur = Some(SessionState(e.us, e.us, 1))
            }
          }
          cur.foreach(state.update)
          closed.reverseIterator
        })
  }

  /** Ordered-stage funnel over an event table: for each entity, stage i
    * converts at the FIRST stage-i event strictly after the entity's
    * stage-(i-1) conversion time (the standard strictly-ordered funnel;
    * an out-of-order click before any view does not convert).
    *
    * Scale shape: one aggregation per stage, each over only that stage's
    * events (type filter prunes before the shuffle) with partial aggs
    * shrinking to |entities| rows; the final assembly is |entities|-sized
    * left joins. No per-entity event buffering anywhere.
    *
    * Returns `[<entity>, completed]` for every entity present in the
    * table — `completed` = number of leading stages converted (0..n). */
  def funnel(
      events: DataFrame,
      stages: Seq[String],
      entityCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "us"): DataFrame = {
    require(stages.nonEmpty, "empty funnel")
    val e = events.select(col(entityCol).as("ent"),
      col(typeCol).as("st"), col(tsCol).as("t"))
    val universe = e.select("ent").distinct()
    val stageTimes = stages.zipWithIndex.foldLeft(List.empty[DataFrame]) {
      case (acc, (stage, i)) =>
        val base = e.filter(col("st") === stage)
        val conv = acc match {
          case Nil =>
            base.groupBy("ent").agg(min(col("t")).as("ct"))
          case prev :: _ =>
            base.join(prev.select(col("ent"), col("ct").as("pt")), Seq("ent"))
              .filter(col("t") > col("pt"))
              .groupBy("ent").agg(min(col("t")).as("ct"))
        }
        conv :: acc
    }.reverse
    val joined = stageTimes.zipWithIndex.foldLeft(universe) {
      case (acc, (st, i)) =>
        acc.join(st.select(col("ent"), col("ct").as(s"t$i")), Seq("ent"), "left")
    }
    val completed = stages.indices.foldLeft(lit(0L)) { (acc, i) =>
      when(col(s"t$i").isNotNull, lit((i + 1).toLong)).otherwise(acc)
    }
    joined.select(col("ent").as(entityCol), completed.as("completed"))
  }

  final case class StageEvent(userId: Long, stage: String, us: Long)
  final case class FunnelState(completed: Int, convUs: Long)
  final case class FunnelAdvance(userId: Long, completed: Long, convUs: Long)

  /** Streaming funnel: per-entity keyed state holds (stages completed,
    * conversion time); each micro-batch replays its events in event-time
    * order and emits one row per entity whose funnel ADVANCED. Same
    * strictly-after semantics as [[funnel]]; an event that arrives in a
    * later batch than a logically-later stage can no longer advance the
    * earlier stage (update-stream semantics — the standing funnel state
    * is the product, not a retroactive recount). State is one (int,
    * long) per entity — bounded by entities, not events. */
  def funnelStreaming(
      events: Dataset[StageEvent], stages: Seq[String]): Dataset[FunnelAdvance] = {
    import events.sparkSession.implicits._
    require(stages.nonEmpty, "empty funnel")
    val stageIdx = stages.zipWithIndex.toMap
    events
      .filter(e => stageIdx.contains(e.stage))
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, rows: Iterator[StageEvent], state: GroupState[FunnelState]) => {
          val sorted = rows.toSeq.sortBy(e => (e.us, stageIdx(e.stage)))
          var cur = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
          val before = cur.completed
          sorted.foreach { e =>
            if (cur.completed < stages.length &&
                e.stage == stages(cur.completed) &&
                (cur.completed == 0 || e.us > cur.convUs))
              cur = FunnelState(cur.completed + 1, e.us)
          }
          if (cur.completed > before) {
            state.update(cur)
            Iterator.single(FunnelAdvance(userId, cur.completed.toLong, cur.convUs))
          } else Iterator.empty
        })
  }

  /** Rolling active-entity counts: for every day in the table's range,
    * the distinct entities active that day (DAU) and within the trailing
    * `windowDays` days (WAU for 7). The window distinct is computed by
    * SMEARING each (entity, day) activity onto the days it keeps the
    * entity active — volume bounded by entities × days × window — then
    * deduping, so no per-day count-distinct over raw events and no
    * window-function buffering. Report days cover only days observed in
    * the data (no synthetic calendar densification). */
  def activeUsers(
      events: DataFrame,
      windowDays: Int = 7,
      entityCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    require(windowDays >= 1, s"windowDays=$windowDays")
    val act = events
      .select(col(entityCol).as("ent"), to_date(col(tsCol)).as("day"))
      .distinct()
    val days = act.select(col("day")).distinct()
    val dau = act.groupBy("day").agg(count(lit(1)).as("dau"))
    val smeared = Gen.explodeOnce(act, Seq(col("ent")),
      sequence(col("day"), date_add(col("day"), windowDays - 1)), "report_day")
      .distinct()
      // only report days that actually occur in the data
      .join(days.select(col("day").as("report_day")), Seq("report_day"), "left_semi")
      .groupBy(col("report_day").as("day"))
      .agg(count(lit(1)).as(s"active_${windowDays}d"))
    dau.join(smeared, Seq("day"))
  }

  /** Cohort retention matrix: entities cohorted by the day of their
    * first event; `[cohort, day_offset, users]` counts entities active
    * `day_offset` days after their cohort day.
    *
    * Scale shape: activity dedups to (entity, day) FIRST — the shuffles
    * after that are bounded by entities × active-days, never raw event
    * volume; first-day is one partial-agg'd aggregation; the final count
    * groups an already-distinct frame, so no count-distinct expansion. */
  def retention(
      events: DataFrame,
      entityCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val act = events
      .select(col(entityCol).as("ent"), to_date(col(tsCol)).as("day"))
      .distinct()
    val first = act.groupBy("ent").agg(min(col("day")).as("cohort"))
    act.join(first, Seq("ent"))
      .select(col("cohort"), datediff(col("day"), col("cohort")).cast("long").as("day_offset"))
      .groupBy("cohort", "day_offset")
      .agg(count(lit(1)).as("users"))
  }
}
