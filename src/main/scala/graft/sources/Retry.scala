package graft.sources

/** Bounded exponential-backoff retry for transient service errors on the
  * JDBC and lookup paths — the FS-commit analogue lives in [[Fs.withRetries]].
  * The reference wraps its writer/export operations and lookup reloads the
  * same way (`OdpsUtils.scala:288-309`: 3 retries, backoff·2ⁿ;
  * `flink-connector-odps/.../OdpsLookupFunction.java:105-150`).
  *
  * Where it is safe to retry differs per operation, so callers opt in at
  * the right granularity:
  *  - staged-export migration: one DB transaction — rolled back on failure,
  *    so re-running the whole transaction is exactly-once safe;
  *  - upsert export: idempotent by construction (MERGE/ON CONFLICT), so the
  *    whole partition re-runs on a fresh connection;
  *  - lookup dimension reload: read-only;
  *  - plain JDBC append is NOT wrapped — a driver-side job retry after a
  *    partial append would duplicate rows; its retry unit is the Spark task
  *    (`spark.task.maxFailures`), same as every other non-transactional sink.
  */
object Retry {

  private[graft] val DefaultRetries = 3
  /** Base backoff; attempt n sleeps base·2ⁿ. Overridable for tests. */
  @volatile private[graft] var baseBackoffMs: Long = 500L

  /** Transient classification for JDBC/service errors: connection-level and
    * transaction-rollback SQLStates (08xxx, 40xxx), the JDBC transient /
    * recoverable exception trees, and IOExceptions other than
    * FileNotFound (deterministic). Everything else — syntax errors,
    * constraint violations, missing tables — fails fast.
    *
    * Walks the CAUSE chain: when the protected block is a Spark action,
    * the executor-side failure arrives wrapped (SparkException →
    * FAILED_EXECUTE_UDF / task-failure layers) and a top-level-only check
    * would never retry a genuinely transient source error underneath. A
    * decisive verdict at any layer (transient exception type, classified
    * SQLState, FileNotFound) stops the walk; unrecognized wrappers
    * delegate to their cause (bounded depth, cycle-safe). */
  def transientDefault(e: Throwable): Boolean = {
    @annotation.tailrec
    def walk(t: Throwable, depth: Int): Boolean = t match {
      case null => false
      case _ if depth > 16 => false
      case _: java.sql.SQLTransientException   => true
      case _: java.sql.SQLRecoverableException => true
      case s: java.sql.SQLException
          if Option(s.getSQLState).exists(st =>
            st.startsWith("08") || st.startsWith("40")) => true
      case _: java.io.FileNotFoundException => false
      case _: java.io.IOException           => true
      case other =>
        val cause = other.getCause
        if (cause eq other) false else walk(cause, depth + 1)
    }
    walk(e, 0)
  }

  /** Run `f`, retrying transient failures up to `retries` times with
    * exponential backoff. Non-transient errors and exhausted retries
    * rethrow the original exception. */
  def withBackoff[T](what: String, retries: Int = DefaultRetries,
      isTransient: Throwable => Boolean = transientDefault)(f: => T): T = {
    var attempt = 0
    while (true) {
      try return f
      catch {
        case scala.util.control.NonFatal(e)
            if attempt < retries && isTransient(e) =>
          Thread.sleep(baseBackoffMs * (1L << attempt))
          attempt += 1
      }
    }
    throw new IllegalStateException(s"unreachable: $what")
  }
}
