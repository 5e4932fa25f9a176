package graft.catalog

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** Process-wide TTL'd LRU caches for table metadata and statistics files.
  *
  * Every query resolution goes through `GraftCatalog.loadTable`, and every
  * planned scan may consult the stats file — without a cache that is a
  * LIST+GET against the metastore per table per query, a metadata hot-spot
  * at high QPS on an object store. The reference caches table meta the
  * same way: 100 entries with a 30 s TTL
  * (`spark-connector/datasource/.../OdpsOptions.scala:40-42`; Trino's
  * connector keeps an equivalent `MaxComputeMetaCache`).
  *
  * Coherence contract: every DDL and stats write THROUGH this process
  * invalidates its entry immediately, so same-process readers never see a
  * stale entry for their own changes; changes made by OTHER processes
  * become visible within the TTL (the reference accepts the same bound).
  */
private[graft] final class TtlLruCache[V](maxEntries: Int) {

  /** Entry lifetime. Overridable for tests. */
  @volatile private[graft] var ttlMs: Long = TtlLruCache.DefaultTtlMs

  // access-order LinkedHashMap = LRU; all access under the map's lock
  // (loads happen OUTSIDE the lock — a slow FS read must not serialize
  // every other table's resolution). Evicting a key also drops its
  // side-table entries so nothing grows past maxEntries.
  private val map = new java.util.LinkedHashMap[String, (Long, V)](16, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[String, (Long, V)]): Boolean = {
      val evict = size() > maxEntries
      if (evict) { loads.remove(e.getKey); invalidatedAt.remove(e.getKey) }
      evict
    }
  }

  /** Per-key count of actual backing loads — the observable tests pin.
    * Bounded: entries die with their key's LRU eviction. */
  private val loads = new ConcurrentHashMap[String, AtomicLong]()

  /** Per-key stamp written by [[invalidate]]. A load that began before
    * the latest invalidation must NOT install its (now stale) value —
    * without this, "read v1 → DDL writes v2 + invalidates → put(v1)"
    * re-caches the pre-DDL state for a full TTL, breaking the documented
    * same-process coherence contract. Bounded like [[loads]]. */
  private val invalidatedAt = new ConcurrentHashMap[String, java.lang.Long]()

  /** Cached value for `key`, loading (and caching) on miss or expiry. A
    * throwing load caches nothing and propagates; a load overtaken by an
    * [[invalidate]] returns its value but does not cache it. */
  def get(key: String)(load: => V): V = {
    val now = System.currentTimeMillis()
    val hit = map.synchronized {
      Option(map.get(key)).collect { case (t, v) if now - t <= ttlMs => v }
    }
    hit.getOrElse {
      val stamp0 = invalidatedAt.get(key)
      val v = load
      loads.computeIfAbsent(key, _ => new AtomicLong()).incrementAndGet()
      map.synchronized {
        if (invalidatedAt.get(key) eq stamp0)
          map.put(key, (System.currentTimeMillis(), v))
      }
      v
    }
  }

  def invalidate(key: String): Unit = map.synchronized {
    // stamps for keys never re-cached (DDL on a cold table) would pile up;
    // clearing wholesale is safe-ish — an in-flight load could then install
    // a value staled by an invalidation that the clear erased, but that
    // needs an invalidate AND an overflow-clear inside one load window
    if (invalidatedAt.size() > 16 * maxEntries) invalidatedAt.clear()
    invalidatedAt.put(key, java.lang.Long.valueOf(System.nanoTime()))
    map.remove(key)
    ()
  }

  private[graft] def loadCount(key: String): Long =
    Option(loads.get(key)).fold(0L)(_.get())
}

private[graft] object TtlLruCache {
  val DefaultTtlMs: Long = 30 * 1000L
}

private[graft] object MetaCache {
  /** Reference-matched sizing: 100 tables, 30 s. */
  val MaxEntries = 100

  /** `_graft_meta.json` contents, keyed by the meta file path. */
  val meta = new TtlLruCache[TableMeta](MaxEntries)

  /** `_graft_stats.json` contents (None = no stats yet), keyed by the
    * stats file path. */
  val stats = new TtlLruCache[Option[TableStatistics.TableStats]](MaxEntries)
}
