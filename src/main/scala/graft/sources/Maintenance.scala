package graft.sources

import org.apache.hadoop.fs.{Path => HPath}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table maintenance: small-file compaction and staging-debris vacuum.
  *
  * Streaming sinks, incremental imports, and per-commit dynamic-partition
  * writes accrete many small files per partition; at 100 TB that turns a
  * scan's task list (and an object store's LIST calls) into the bottleneck.
  * The reference delegates this to its warehouse service (its Hive layer
  * carries the compactor conf surface through untouched,
  * `spark-connector/hive/.../HiveUtils.scala:278-280`; MaxCompute merges
  * small files service-side) — a standalone Spark engine has to own it.
  *
  * Compaction here is a metadata-planned rewrite: the partition listing
  * (file counts + bytes, no data read) picks the fragmented partitions,
  * ONE Spark job rewrites exactly those partitions into
  * ceil(bytes/targetFileBytes) files each, and the staged stage-then-swap
  * commit of [[PartitionedWrite.writePartitioned]] makes the swap
  * crash-safe — readers never see a partition half-compacted, and a
  * failure leaves the original files in place.
  */
object Maintenance {

  /** One fragmented leaf partition: `rel` is the `col=v/col2=v2` rel-path
    * ("" for an unpartitioned table), `targetFiles` what compaction would
    * rewrite it to. */
  final case class CompactionPlan(rel: String, files: Int, bytes: Long,
      targetFiles: Int)

  private def dataFiles(p: HPath) =
    Fs.of(p).listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))

  /** Test seam: invoked at unpartitioned-swap step boundaries ("adopt" per
    * staged file, "adopted", "retire" per old file, "retired") so
    * crash-injection tests can kill the commit at any point and assert
    * what a reader sees. Production no-op. */
  private[graft] var onSwapStep: String => Unit = _ => ()

  /** Test seam: invoked right after the planning snapshot of the file sets
    * under compaction — in [[compactPartitions]] (per-candidate sets) and in
    * [[compactUnpartitioned]] (root set) — so tests can interleave a
    * concurrent append inside the planning→swap window. Production no-op. */
  private[graft] var onPartitionedPlan: () => Unit = () => ()

  private def leafDirs(root: HPath, partitionCols: Seq[String],
      depth: Int = 0, rel: String = ""): Seq[(String, HPath)] =
    if (depth == partitionCols.length) Seq(rel -> root)
    else if (!Fs.isDir(root)) Seq.empty
    else Fs.listDirs(root)
      .filter(_.getName.startsWith(partitionCols(depth) + "="))
      .flatMap(d => leafDirs(d, partitionCols, depth + 1,
        if (rel.isEmpty) d.getName else s"$rel/${d.getName}"))

  /** Partitions worth rewriting: more files than ceil(bytes/target) — the
    * file count a single well-sized write would produce. Pure FS listing,
    * no data read, no Spark job. */
  def compactionCandidates(path: String, partitionCols: Seq[String],
      targetFileBytes: Long): Seq[CompactionPlan] = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    leafDirs(new HPath(path), partitionCols).flatMap { case (rel, dir) =>
      val fs = dataFiles(dir)
      val bytes = fs.map(_.getLen).sum
      val target = math.max(1L,
        (bytes + targetFileBytes - 1) / targetFileBytes).toInt
      if (fs.size > target) Some(CompactionPlan(rel, fs.size, bytes, target))
      else None
    }
  }

  /** Rewrite every fragmented partition of a partitioned parquet table into
    * `ceil(bytes/targetFileBytes)` files, in one Spark job, committed
    * stage-then-swap per partition. Only the partitions named by
    * [[compactionCandidates]] are read or touched — the cost is
    * proportional to the fragmentation, not the table. Returns the
    * rewritten partition rel-paths (for a touched-scope stats refresh).
    *
    * Rows are routed to output files by a hash of all columns, so the
    * rewrite is deterministic under any input partitioning. Each partition
    * comes out in AT MOST `targetFiles` files: the bucket exchange is
    * AQE-coalescible, so buckets whose shuffle bytes fall under the
    * advisory partition size merge into fewer, better-sized files — at a
    * production `targetFileBytes` (≥ the advisory size) buckets stay
    * separate and the count is exact. NOT for hash/range-clustered
    * tables — an arbitrary-hash rewrite would break their bucket-to-file
    * contract (the catalog wrapper rejects them).
    */
  def compactPartitions(spark: SparkSession, path: String,
      partitionCols: Seq[String],
      targetFileBytes: Long = 128L * 1024 * 1024,
      swapRecoveryMinAgeMs: Long = SwapRecoveryMinAgeMs): Seq[String] = {
    // Manifest-pointer tables commit maintenance the way they commit
    // writes: generation write + ONE pointer flip — never the rename
    // adopt/retire swap below, which on object stores is rename-as-copy
    // with a reader-visible window and would bypass the table's own
    // pointer (readers resolve through it, so renamed-in files would be
    // invisible and retired files dangling).
    if (ManifestCommit.isManifestTable(path)) {
      val rewritten = ManifestCommit.compactFragmented(
        spark, path, partitionCols, targetFileBytes)
      if (rewritten.nonEmpty) spark.catalog.refreshByPath(path)
      return rewritten
    }
    recoverInterruptedSwap(new HPath(path), swapRecoveryMinAgeMs)
    if (partitionCols.isEmpty) return compactUnpartitioned(
      spark, path, targetFileBytes)
    val plans = compactionCandidates(path, partitionCols, targetFileBytes)
    if (plans.isEmpty) return Seq.empty
    val root = new HPath(path)
    // Concurrent-writer guard: snapshot each candidate's file set now, and
    // have the swap re-list at commit time — a partition whose files
    // changed since planning (a writer appended mid-compaction) is SKIPPED,
    // its staged rewrite discarded, its new rows untouched; the next run
    // recompacts it. The re-list-to-rename window is not zero; writers
    // racing the swap itself need a single maintenance owner.
    def partDir(rel: String) = rel.split('/').foldLeft(root)(new HPath(_, _))
    def fileSet(rel: String): Map[String, Long] =
      dataFiles(partDir(rel)).map(f => f.getPath.getName -> f.getLen).toMap
    val snapshot = plans.map(p => p.rel -> fileSet(p.rel)).toMap
    onPartitionedPlan()
    // One read branch per DISTINCT target file count (few in practice):
    // each branch lists only its partitions' directories and buckets rows
    // with a constant modulus — no plan-table join, no value re-parsing.
    val branches = plans.groupBy(_.targetFiles).toSeq.map { case (n, ps) =>
      val dirs = ps.map(p =>
        p.rel.split('/').foldLeft(root)(new HPath(_, _)).toString)
      val df = spark.read.option("basePath", path).parquet(dirs: _*)
      df.withColumn("__graft_bucket",
        pmod(xxhash64(df.columns.map(col): _*), lit(n.toLong)).cast("int"))
    }
    val data = branches.reduce(_ unionByName _)
    val clustered = data
      .repartition((partitionCols :+ "__graft_bucket").map(col): _*)
      .drop("__graft_bucket")
    val rewritten = PartitionedWrite.writePartitioned(clustered, path,
      partitionCols, limit = Int.MaxValue, preClustered = true,
      swapGuard = Some(rel => snapshot.get(rel).contains(fileSet(rel))))
    // Same-session readers may hold pre-swap listings in Spark's shared
    // FileStatusCache; a retired file served from it fails the next scan
    // (FILE_NOT_EXIST). Invalidate the path after any swap — the analogue
    // of the reference invalidating its table-meta cache on DDL.
    if (rewritten.nonEmpty) spark.catalog.refreshByPath(path)
    rewritten
  }

  /** Unpartitioned rewrite, committed adopt-then-retire: staged files join
    * the root FIRST (UUID-suffixed names cannot collide with the old set),
    * then the old files move aside into `staging/.retire`, and nothing is
    * deleted until both steps finished — at EVERY crash point the root
    * holds a complete copy of the table (the old set, the new set, or
    * transiently both; a concurrent reader may briefly see duplicate rows
    * during the swap, never missing ones). A mid-swap failure preserves
    * staging — including the retired originals and a `_swap_manifest.json`
    * naming the old/new file sets — so recovery is mechanical.
    *
    * Concurrent-writer guard: the root file set is snapshotted at planning
    * and re-checked after the staged write; if it changed (a writer
    * appended or replaced a file), the stale rewrite is DISCARDED and the
    * table left untouched — the next maintenance run recompacts. The
    * re-check-to-adopt window is not zero; concurrent writers during the
    * swap itself still need external coordination (single maintenance
    * owner), as with any FS-level table format without a lock service. */
  private def compactUnpartitioned(spark: SparkSession, path: String,
      targetFileBytes: Long): Seq[String] = {
    val plans = compactionCandidates(path, Nil, targetFileBytes)
    if (plans.isEmpty) return Seq.empty
    rewriteUnpartitioned(spark, path) { df =>
      df.withColumn("__graft_bucket",
          pmod(xxhash64(df.columns.map(col): _*),
            lit(plans.head.targetFiles.toLong)).cast("int"))
        .repartition(col("__graft_bucket"))
        .drop("__graft_bucket")
    }
  }

  /** Shared root-file rewrite under the adopt-then-retire commit and the
    * planning-snapshot concurrent-writer guard (contract documented on
    * [[compactUnpartitioned]]); `layout` shapes the replacement file set
    * (hash buckets for compaction, curve order for [[zorderRewrite]]). */
  private def rewriteUnpartitioned(spark: SparkSession, path: String)(
      layout: DataFrame => DataFrame): Seq[String] = {
    val root = new HPath(path)
    val fs = Fs.of(root)
    def snapshot() = dataFiles(root).map(f => f.getPath.getName -> f.getLen).toMap
    val planned = snapshot()
    onPartitionedPlan()
    val staging = fs.makeQualified(
      new HPath(root, s".graft_staging_${java.util.UUID.randomUUID()}"))
    var swapping = false
    try {
      layout(spark.read.parquet(path))
        .write.mode("append").parquet(staging.toString)
      if (snapshot() != planned) return Seq.empty // stale rewrite; staging cleaned
      val staged = dataFiles(staging).map(_.getPath)
      Fs.writeString(new HPath(staging, "_swap_manifest.json"),
        s"""{"old":[${planned.keys.toSeq.sorted.map(n => s""""$n"""").mkString(",")}],""" +
          s""""new":[${staged.map(_.getName).sorted.map(n => s""""$n"""").mkString(",")}]}""")
      swapping = true
      staged.foreach { p =>
        onSwapStep("adopt")
        if (!Fs.renameRetried(p, new HPath(root, p.getName)))
          sys.error(s"compaction commit failed: $p -> $root; " +
            s"staged data preserved at $staging")
      }
      onSwapStep("adopted")
      val retire = new HPath(staging, ".retire")
      Fs.mkdirs(retire)
      planned.keys.foreach { name =>
        onSwapStep("retire")
        if (!Fs.renameRetried(new HPath(root, name), new HPath(retire, name)))
          sys.error(s"compaction commit failed: retiring $name; " +
            s"swap state preserved at $staging (see _swap_manifest.json)")
      }
      onSwapStep("retired")
      swapping = false
      spark.catalog.refreshByPath(path) // drop pre-swap file listings
      Seq("")
    } finally if (!swapping) Fs.delete(staging)
  }

  /** Rewrite a table's files in Z-order over `zorderCols` (the `OPTIMIZE …
    * ZORDER BY` maintenance op): every file comes out tight in ALL the
    * clustering dimensions, so min/max skipping works for predicates on any
    * of them ([[graft.operators.ZOrder]] for the layout math). Unlike
    * compaction this rewrites EVERY partition — it is a layout change, not
    * a fragmentation repair — but reuses the same crash-safe commits and
    * concurrent-writer guards: adopt-then-retire + planning-snapshot for
    * the unpartitioned root, per-partition staged swap with re-list guard
    * for partitioned tables (changed partitions are skipped, their stale
    * rewrite discarded). Partitioned tables cluster WITHIN each partition:
    * partition pruning stays the coarse filter, the curve tightens file
    * spans inside. Returns the rewritten partition rel-paths.
    */
  def zorderRewrite(spark: SparkSession, path: String,
      partitionCols: Seq[String], zorderCols: Seq[String],
      targetFileBytes: Long = 128L * 1024 * 1024,
      bits: Int = 8,
      swapRecoveryMinAgeMs: Long = SwapRecoveryMinAgeMs): Seq[String] = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    // manifest-pointer tables: layout rewrite under the pointer commit
    // (see compactPartitions — same hazard, same routing)
    if (ManifestCommit.isManifestTable(path)) {
      val rewritten = ManifestCommit.zorderRewrite(
        spark, path, partitionCols, zorderCols, targetFileBytes, bits)
      if (rewritten.nonEmpty) spark.catalog.refreshByPath(path)
      return rewritten
    }
    val root = new HPath(path)
    recoverInterruptedSwap(root, swapRecoveryMinAgeMs)
    def targetFor(bytes: Long) =
      math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    if (partitionCols.isEmpty) {
      val files = dataFiles(root)
      if (files.isEmpty) return Seq.empty
      val n = targetFor(files.map(_.getLen).sum)
      return rewriteUnpartitioned(spark, path)(
        graft.operators.ZOrder.cluster(_, zorderCols, n, bits))
    }
    val leaves = leafDirs(root, partitionCols)
      .filter { case (_, dir) => dataFiles(dir).nonEmpty }
    if (leaves.isEmpty) return Seq.empty
    def fileSet(dir: HPath): Map[String, Long] =
      dataFiles(dir).map(f => f.getPath.getName -> f.getLen).toMap
    val snapshot = leaves.map { case (rel, dir) => rel -> fileSet(dir) }.toMap
    val dirByRel = leaves.toMap
    onPartitionedPlan()
    val totalTarget = leaves.map { case (_, dir) =>
      targetFor(dataFiles(dir).map(_.getLen).sum) }.sum
    val df = spark.read.option("basePath", path)
      .parquet(leaves.map(_._2.toString): _*)
    val zk = graft.operators.ZOrder.key(
      graft.operators.ZOrder.fitBoundaries(df, zorderCols, bits),
      zorderCols, bits)
    // one range exchange on (partition cols, curve key): tasks hold
    // contiguous curve runs within a partition, the dynamic-partition
    // writer splits any partition-straddling task by directory
    val orderCols = partitionCols.map(col) :+ col("__graft_zkey")
    val clustered = df.withColumn("__graft_zkey", zk)
      .repartitionByRange(totalTarget, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .drop("__graft_zkey")
    val rewritten = PartitionedWrite.writePartitioned(clustered, path,
      partitionCols, limit = Int.MaxValue, preClustered = true,
      swapGuard = Some(rel =>
        dirByRel.get(rel).exists(d => snapshot(rel) == fileSet(d))))
    if (rewritten.nonEmpty) spark.catalog.refreshByPath(path)
    rewritten
  }

  /** Minimum manifest age before [[recoverInterruptedSwap]] treats an
    * unresolved swap as crashed rather than live. A swap's manifest exists
    * only for the duration of the adopt+retire renames (seconds); one this
    * old belongs to a dead run. */
  val SwapRecoveryMinAgeMs: Long = 15 * 60 * 1000L

  /** Mechanical recovery from a crashed unpartitioned swap, driven by the
    * `_swap_manifest.json` the commit wrote before its first rename. Left
    * unresolved, the interrupted state (full old set + some adopted new
    * files = duplicate rows) would be made PERMANENT by the next compaction
    * run rewriting the duplicates — so every [[compactPartitions]] call
    * resolves it first.
    *
    * A manifest YOUNGER than `minAgeMs` may belong to a LIVE swap — another
    * maintenance run between its adopt and retire steps. "Recovering" that
    * state would delete the live run's adopted files and let its retire
    * step strand the table with NEITHER file set. Age cannot distinguish
    * live from freshly-crashed, so maintenance REFUSES to proceed until
    * the manifest ages past the window (or an operator resolves it) —
    * the same conservative stance [[vacuumStaging]] takes with its TTL.
    *
    * Adopt-then-retire ordering makes recovery
    * deterministic from the root's state alone:
    *  - every old file still present → the crash was mid-adopt; the old set
    *    is complete, so un-adopt (delete) any new files and keep the old;
    *  - any old file missing → adoption had finished (retire only starts
    *    after), so the new set is complete; finish retiring old files.
    * Either way the staging dir (manifest + retired originals) is then
    * deleted. No-op when no manifest is present. */
  private[graft] def recoverInterruptedSwap(root: HPath,
      minAgeMs: Long = SwapRecoveryMinAgeMs): Unit = {
    if (!Fs.isDir(root)) return
    val fs = Fs.of(root)
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(".graft_staging_"))
      .foreach { st =>
        val manifest = new HPath(st.getPath, "_swap_manifest.json")
        if (Fs.exists(manifest)) {
          val age = System.currentTimeMillis() -
            fs.getFileStatus(manifest).getModificationTime
          if (age < minAgeMs) sys.error(
            s"unresolved swap manifest $manifest is ${age / 1000}s old — " +
              "possibly a LIVE concurrent swap; refusing maintenance until " +
              s"it ages past ${minAgeMs / 1000}s or an operator resolves it")
          val json = Fs.readString(manifest)
          def names(key: String): Seq[String] =
            s""""$key":\\[([^\\]]*)\\]""".r.findFirstMatchIn(json)
              .map(_.group(1).split(',').toSeq.map(_.trim.stripPrefix("\"")
                .stripSuffix("\"")).filter(_.nonEmpty))
              .getOrElse(Seq.empty)
          val oldSet = names("old")
          val newSet = names("new")
          val oldComplete = oldSet.forall(n => Fs.exists(new HPath(root, n)))
          if (oldComplete)
            newSet.foreach(n => Fs.deleteRetried(new HPath(root, n)))
          else {
            val retire = new HPath(st.getPath, ".retire")
            Fs.mkdirs(retire)
            oldSet.filter(n => Fs.exists(new HPath(root, n))).foreach { n =>
              if (!Fs.renameRetried(new HPath(root, n), new HPath(retire, n)))
                sys.error(s"swap recovery failed: retiring $n under $root")
            }
          }
          Fs.deleteRetried(st.getPath)
        }
      }
  }

  /** Delete `.graft_staging_*` directories older than `ttlMs` — debris from
    * commits that died before their swap (the writers deliberately preserve
    * staging on mid-swap failure so an operator can recover; once recovered
    * or irrelevant, vacuum reclaims the space). The TTL guards in-flight
    * commits: a staging directory younger than the longest plausible write
    * is never touched. Returns the deleted paths. */
  def vacuumStaging(path: String, ttlMs: Long): Seq[String] = {
    val root = new HPath(path)
    if (!Fs.isDir(root)) return Seq.empty
    val cutoff = System.currentTimeMillis() - ttlMs
    Fs.of(root).listStatus(root).toSeq
      .filter(s => s.isDirectory &&
        s.getPath.getName.startsWith(".graft_staging_") &&
        s.getModificationTime < cutoff)
      .map { s => Fs.delete(s.getPath); s.getPath.toString }
  }
}
