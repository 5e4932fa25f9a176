package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture apply semantics.
  *
  * The reference's OGG handler streams I/U/D operations with key columns,
  * change type/time/id metadata and optional before-images
  * (`ogg-plugin/.../modle/TableMapping.java:43-56`,
  * `ColumnMapping.java:26-41`, `UpdateOperationHandler.java`). Applying such
  * an op log to get current state is: latest op per key wins, deletes drop
  * the key. One shuffle on the key; at 100 TB the op log is partitioned by
  * key hash (the reference's shard-hash routing, `TableMapping.java:56`) so
  * per-key order is preserved within a partition.
  */
object Cdc {

  val OpInsert = "I"
  val OpUpdate = "U"
  val OpDelete = "D"

  /** Collapse an op log to final table state. `orderCols` must totally order
    * ops within a key (change time + change id, per the OGG metadata).
    * Expects ONE schema; an op log whose later batches evolved (added
    * columns, widened types) goes through [[unionEvolved]] first —
    * see [[applyLogEvolved]]. */
  def applyLog(ops: DataFrame, keyCols: Seq[String], opCol: String,
      orderCols: Seq[Column]): DataFrame =
    Merge.latestWins(ops, keyCols, orderCols)
      .filter(col(opCol) =!= OpDelete)

  /** Union op-log batches whose schemas EVOLVED over time — the
    * column-add / type-widen drift a long-lived CDC capture accrues as
    * the source table migrates (the reference ships a type-conversion
    * risk table for exactly this migration surface,
    * `odps-data-carrier/.../HiveTypeTransformer.java:79-187`; its
    * "safe" conversions are the ones sanctioned here).
    *
    * Rules, applied per column name across all batches:
    *  - a column missing from a batch is filled with NULL — an added
    *    column is by definition nullable for rows that predate it;
    *  - integral widths widen to the widest seen (byte→short→int→long),
    *    float widens to double — lossless, order-independent;
    *  - ANY other type disagreement (string vs long, decimal scale
    *    change, struct reshape) throws `IllegalArgumentException`
    *    naming every conflicting column — silently coercing those is
    *    how a CDC pipeline corrupts history, so the caller must
    *    migrate explicitly.
    *
    * Column order is first-seen order, so the earliest batch's layout
    * is stable. Pure metadata resolution driver-side; the data path is
    * each batch cast/null-filled once and unioned — no shuffle. */
  def unionEvolved(batches: Seq[DataFrame]): DataFrame = {
    require(batches.nonEmpty, "unionEvolved needs at least one batch")
    import org.apache.spark.sql.types._
    val integral: Set[DataType] =
      Set(ByteType, ShortType, IntegerType, LongType)
    def widen(a: DataType, b: DataType): Option[DataType] = (a, b) match {
      case _ if a == b => Some(a)
      case _ if integral(a) && integral(b) =>
        Some(if (a.defaultSize >= b.defaultSize) a else b)
      case (FloatType, DoubleType) | (DoubleType, FloatType) =>
        Some(DoubleType)
      case _ => None
    }
    val evolved = scala.collection.mutable.LinkedHashMap[String, DataType]()
    val conflicts = scala.collection.mutable.ArrayBuffer[String]()
    for (b <- batches; f <- b.schema.fields) evolved.get(f.name) match {
      case None => evolved(f.name) = f.dataType
      case Some(t) => widen(t, f.dataType) match {
        case Some(w) => evolved(f.name) = w
        case None =>
          conflicts += s"${f.name} (${t.simpleString} vs " +
            s"${f.dataType.simpleString})"
      }
    }
    if (conflicts.nonEmpty) throw new IllegalArgumentException(
      "unionEvolved: op-log batches disagree on column type(s) beyond " +
        s"sanctioned widenings: ${conflicts.distinct.mkString(", ")} — " +
        "migrate these columns explicitly before applying the log")
    batches.map { b =>
      val present = b.columns.toSet
      b.select(evolved.toSeq.map { case (n, t) =>
        (if (present(n)) col(n).cast(t) else lit(null).cast(t)).as(n)
      }: _*)
    }.reduce(_.unionByName(_))
  }

  /** [[applyLog]] over schema-evolving batches: [[unionEvolved]] then
    * collapse. Rows that predate an added column surface NULL for it in
    * the final state (unless a later op rewrote the key). */
  def applyLogEvolved(batches: Seq[DataFrame], keyCols: Seq[String],
      opCol: String, orderCols: Seq[Column]): DataFrame =
    applyLog(unionEvolved(batches), keyCols, opCol, orderCols)

  /** Before-image consistency audit for op logs that carry both images —
    * the OGG update schema (`ColumnMapping.java:26-41`: `dest` after-image,
    * `destOld` before-image). A well-formed log has every U/D op's
    * before-image equal to the previous op's after-image for that key;
    * violations indicate lost or reordered changes (the failure mode the
    * reference's shard-hash routing exists to prevent). Returns the
    * violating ops with the expected image attached. */
  def beforeImageViolations(ops: DataFrame, keyCols: Seq[String], opCol: String,
      orderCol: Column, beforeCol: String, afterCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCol)
    ops
      .withColumn("expected_before", lag(col(afterCol), 1).over(w))
      .filter(col(opCol).isin(OpUpdate, OpDelete) &&
        col("expected_before").isNotNull &&
        // null-SAFE inequality: a NULL before-image on a U/D op is itself
        // a violation (=!= would evaluate NULL and silently pass it)
        !(col(beforeCol) <=> col("expected_before")))
  }

  /** Net-effect summary per key: ops applied, final op, alive flag.
    * Aggregation-only form (no window) — cheaper when only the summary is
    * needed: max_by picks the terminal op by the same total order. */
  def netEffect(ops: DataFrame, keyCols: Seq[String], opCol: String,
      orderCol: Column): DataFrame =
    ops.groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("op_count"),
        max_by(col(opCol), orderCol).as("final_op"))
      .withColumn("alive", col("final_op") =!= OpDelete)

  /** Snapshot diff — the INVERSE of [[applyLog]]: the minimal I/U/D op
    * log that transforms snapshot `before` into snapshot `after`, keyed
    * by `keyCols` (the table-versioning "what changed between loads"
    * question; feeding the result to [[applyLog]] over `before`
    * reproduces `after`). Values compare null-safely as one struct
    * (codegen'd); unchanged keys drop out.
    *
    * Scale: ONE full-outer join keyed on the key columns — the same
    * shuffle any keyed compare costs; no driver materialization. Emits
    * `after`'s row for I/U and `before`'s for D, plus `opCol`. */
  def snapshotDiff(before: DataFrame, after: DataFrame,
      keyCols: Seq[String], opCol: String = "op"): DataFrame = {
    require(before.columns.sorted.sameElements(after.columns.sorted),
      s"schemas differ: ${before.columns.toSeq} vs ${after.columns.toSeq}")
    require(keyCols.nonEmpty && keyCols.forall(before.columns.contains),
      s"bad key columns $keyCols")
    val valCols = after.columns.filterNot(keyCols.contains).toSeq
    def pack(df: DataFrame, v: String) = df.select(
      struct(keyCols.map(col): _*).as("__k"),
      struct(valCols.map(col): _*).as(v))
    val joined = pack(before, "__bv")
      .join(pack(after, "__av"), Seq("__k"), "full_outer")
      .withColumn(opCol,
        when(col("__bv").isNull, OpInsert)
          .when(col("__av").isNull, OpDelete)
          .when(!(col("__av") <=> col("__bv")), OpUpdate))
      .filter(col(opCol).isNotNull)
    val v = coalesce(col("__av"), col("__bv"))
    joined.select(
      keyCols.map(k => col("__k").getField(k).as(k)) ++
        valCols.map(c => v.getField(c).as(c)) :+ col(opCol): _*)
  }

  /** [[snapshotDiff]] with BOTH images — the OGG update shape
    * (`ColumnMapping.java:26-41`: `dest` after-image, `destOld`
    * before-image): one row per changed key with `before_image` /
    * `after_image` value structs (NULL for I / D respectively) and the
    * op. This is the log [[incrementalAgg]] consumes — an Update's
    * DELTA needs both sides. Same single full-outer keyed join as
    * [[snapshotDiff]]. */
  def snapshotDiffImaged(before: DataFrame, after: DataFrame,
      keyCols: Seq[String], opCol: String = "op"): DataFrame = {
    require(before.columns.sorted.sameElements(after.columns.sorted),
      s"schemas differ: ${before.columns.toSeq} vs ${after.columns.toSeq}")
    require(keyCols.nonEmpty && keyCols.forall(before.columns.contains),
      s"bad key columns $keyCols")
    val valCols = after.columns.filterNot(keyCols.contains).toSeq
    def pack(df: DataFrame, v: String) = df.select(
      struct(keyCols.map(col): _*).as("__k"),
      struct(valCols.map(col): _*).as(v))
    pack(before, "__bv")
      .join(pack(after, "__av"), Seq("__k"), "full_outer")
      .withColumn(opCol,
        when(col("__bv").isNull, OpInsert)
          .when(col("__av").isNull, OpDelete)
          .when(!(col("__av") <=> col("__bv")), OpUpdate))
      .filter(col(opCol).isNotNull)
      .select(keyCols.map(k => col("__k").getField(k).as(k)) :+
        col("__bv").as("before_image") :+ col("__av").as("after_image") :+
        col(opCol): _*)
  }

  /** Incremental aggregate maintenance (IVM for distributive
    * aggregates): fold an imaged CDC log into a standing per-group
    * (row count, value sum) rollup WITHOUT rescanning the base table —
    * at 100 TB the base scan is exactly what a maintained rollup
    * exists to avoid. Each op contributes removal of its before-image
    * and addition of its after-image (an Update that MOVES a row
    * between groups naturally splits into −old-group / +new-group
    * contributions), the contributions aggregate to a
    * changed-groups-sized delta, and ONE keyed merge join updates the
    * rollup; groups whose count reaches 0 drop out.
    *
    * Exactness: per-row values round to DECIMAL(28,6) before summing
    * (the [[graft.dsum]] discipline), so
    * `incrementalAgg(agg(v1), diff(v1, v2)) ≡ agg(v2)` EXACTLY — the
    * q178 gate pins that equivalence against a from-scratch oracle.
    * Null `valueCol`s add nothing to the sum but count as rows, like
    * any aggregate. Groups are merged by SQL equality — a NULL group
    * does not merge with itself across prior and delta; bucket null
    * groups upstream (coalesce) if they occur.
    *
    * `prior` carries (groupCol, nCol, sumCol) as produced by a prior
    * run of the same rollup; returns the same shape.
    *
    * `pruneEmpty = false` KEEPS zero/negative-count groups — required
    * when deltas may apply out of order (deltas form a commutative
    * monoid, so any once-each application order converges, but an
    * intermediate state can hold a group at n ≤ 0 whose mass a prune
    * would destroy; prune at READ time instead —
    * [[graft.streaming.MicroBatch.readRollup]]). */
  def incrementalAgg(prior: DataFrame, imagedLog: DataFrame,
      groupCol: String, valueCol: String, nCol: String = "n",
      sumCol: String = "sum_v", opCol: String = "op",
      pruneEmpty: Boolean = true): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val dec = DecimalType(28, 6)
    val delta = aggDelta(imagedLog, groupCol, valueCol, opCol)
      .withColumnRenamed(groupCol, "__g")
    prior
      .select(col(groupCol).as("__g"), col(nCol).as("__n"),
        col(sumCol).cast(dec).as("__s"))
      .join(delta, Seq("__g"), "full_outer")
      .select(col("__g").as(groupCol),
        (coalesce(col("__n"), lit(0L)) + coalesce(col("__dn"), lit(0L)))
          .as(nCol),
        (coalesce(col("__s"), lit(0).cast(dec)) +
          coalesce(col("__dv"), lit(0).cast(dec)))
          .cast(DoubleType).as(sumCol))
      .filter(if (pruneEmpty) col(nCol) > 0 else lit(true))
  }

  /** The changed-groups-sized ADDITIVE delta of one imaged CDC log slice:
    * (groupCol, __dn, __dv), where `__dn` is the row-count change and
    * `__dv` the exact DECIMAL(28,6) value-sum change (the [[graft.dsum]]
    * rounding discipline — each op contributes −before / +after). Deltas
    * form a commutative monoid, so any once-each merge order converges
    * exactly — which is what lets
    * [[graft.streaming.MicroBatch.streamRollup]] append them as LSM
    * segments and merge at read time instead of rewriting the standing
    * state per batch. [[incrementalAgg]] is the one-step fold of this
    * delta into a prior rollup. `__dv` is NULL for a group whose ops all
    * carry NULL values (sum-over-nothing), matching aggregate
    * convention. */
  def aggDelta(imagedLog: DataFrame, groupCol: String, valueCol: String,
      opCol: String = "op"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(groupCol != "__dn" && groupCol != "__dv",
      s"groupCol $groupCol collides with the delta's reserved columns")
    val dec = DecimalType(28, 6)
    val contrib = imagedLog.select(explode(array(
        when(col(opCol) =!= OpInsert, struct(
          col(s"before_image.$groupCol").as("__g"),
          lit(-1L).as("__dn"),
          (-col(s"before_image.$valueCol")).cast(dec).as("__dv"))),
        when(col(opCol) =!= OpDelete, struct(
          col(s"after_image.$groupCol").as("__g"),
          lit(1L).as("__dn"),
          col(s"after_image.$valueCol").cast(dec).as("__dv")))))
        .as("__c"))
      .filter(col("__c").isNotNull)
      .select(col("__c.__g").as("__g"), col("__c.__dn").as("__dn"),
        col("__c.__dv").as("__dv"))
    contrib.groupBy(col("__g"))
      .agg(sum(col("__dn")).as("__dn"),
        sum(col("__dv")).cast(dec).as("__dv"))
      .withColumnRenamed("__g", groupCol)
  }

  /** SCD Type-2 dimension history from an op log: one VALIDITY-INTERVAL
    * row per surviving op — `valid_from` = the op's change time,
    * `valid_to` = the NEXT op's change time for that key (NULL = still
    * current), `is_current` flag. A delete op closes the previous
    * version's interval (its timestamp becomes that row's `valid_to`)
    * without opening one — the lead window runs BEFORE the delete filter
    * so a deleted key's history ends at the delete time with no current
    * row.
    *
    * `orderCols` breaks ties when change times repeat within a key (the
    * OGG change-id convention, same contract as [[applyLog]]).
    *
    * Scale: one hash exchange on the key + a per-key sort — the minimum
    * any versioning pass costs; output is op-log-sized, never joined
    * against the dimension. */
  def scd2(ops: DataFrame, keyCols: Seq[String], opCol: String,
      tsCol: String, orderCols: Seq[Column] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol) +: orderCols: _*)
    ops
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .filter(col(opCol) =!= OpDelete)
      .withColumn("is_current", col("valid_to").isNull)
  }
}
