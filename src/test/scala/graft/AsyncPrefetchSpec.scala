package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.sources.{AsyncPrefetch, JdbcImport}

class AsyncPrefetchSpec extends SparkTestBase {

  test("prefetch preserves every element in order") {
    val out = AsyncPrefetch.prefetch((1 to 1000).iterator, chunkRows = 16).toSeq
    assert(out == (1 to 1000))
    assert(AsyncPrefetch.prefetch(Iterator.empty[Int]).toSeq.isEmpty)
  }

  test("a producer error surfaces to the consumer at its stream position") {
    val src = new Iterator[Int] {
      private var i = 0
      override def hasNext: Boolean = true
      override def next(): Int = {
        i += 1
        if (i > 10) sys.error("source broke at 11") else i
      }
    }
    val it = AsyncPrefetch.prefetch(src, chunkRows = 4)
    val seen = scala.collection.mutable.ArrayBuffer.empty[Int]
    val e = intercept[RuntimeException] {
      while (it.hasNext) seen += it.next()
    }
    assert(e.getMessage.contains("source broke"))
    // complete chunks before the failure point are delivered (8 = two
    // whole chunks of 4; the failing third chunk is discarded)
    assert(seen.toSeq == (1 to 8))
  }

  test("the producer reads ahead of a slow consumer, bounded by the queue") {
    val produced = new AtomicInteger(0)
    val src = (1 to 10000).iterator.map { i => produced.incrementAndGet(); i }
    val it = AsyncPrefetch.prefetch(src, queueChunks = 4, chunkRows = 100)
    assert(it.next() == 1)
    // while the consumer sits here, the producer must run ahead…
    val deadline = System.currentTimeMillis() + 5000
    while (produced.get() < 300 && System.currentTimeMillis() < deadline)
      Thread.sleep(10)
    assert(produced.get() >= 300, "producer did not read ahead")
    Thread.sleep(50)
    // …but the bounded queue must stop it from swallowing the whole source
    assert(produced.get() <= 100 * (4 + 2),
      s"queue bound not respected: ${produced.get()} produced")
    assert(it.toSeq == (2 to 10000), "read-ahead must not reorder or drop")
  }

  test("a stalled producer surfaces as a timeout, not a hung task") {
    val src = new Iterator[Int] {
      override def hasNext: Boolean = true
      override def next(): Int = { Thread.sleep(600000); 0 }
    }
    val it = AsyncPrefetch.prefetch(src, timeoutMs = 200)
    intercept[java.util.concurrent.TimeoutException](it.hasNext)
  }

  test("a slow-but-alive source never times out: progress resets the clock") {
    // 12 rows at ~60 ms each = ~720 ms total, chunkRows far larger than
    // the row count, timeout 200 ms: a whole-chunk arrival bound would
    // fire (no chunk inside 200 ms); a progress bound must not
    val src = new Iterator[Int] {
      private var i = 0
      override def hasNext: Boolean = i < 12
      override def next(): Int = { Thread.sleep(60); i += 1; i }
    }
    val it = AsyncPrefetch.prefetch(src, chunkRows = 256, timeoutMs = 200)
    assert(it.toSeq == (1 to 12))
  }

  test("rows() is plan-transparent: same schema, rows and partitioning") {
    val o = Tables.orders(spark, sf).repartition(4)
    val wrapped = AsyncPrefetch.rows(o, queueChunks = 2, chunkRows = 64)
    assert(wrapped.schema == o.schema)
    assert(wrapped.rdd.getNumPartitions == o.rdd.getNumPartitions)
    val (a, b) = (
      o.agg(count(lit(1)), sum(col("o_orderkey"))).head(),
      wrapped.agg(count(lit(1)), sum(col("o_orderkey"))).head())
    assert(a == b)
  }

  test("jdbc import with prefetch enabled returns identical rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_derby_pf").toString
    val url = s"jdbc:derby:$dir/db;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE emp (id INT PRIMARY KEY, sal DOUBLE)")
    (1 to 97).foreach(i => st.execute(s"INSERT INTO emp VALUES ($i, ${i * 10.0})"))
    conn.close()
    val df = JdbcImport.importTable(spark, JdbcImport.ImportConfig(
      url = url, table = "emp", splitBy = "id", numMappers = 4,
      prefetchChunks = 4))
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 97)
    assert(df.agg(sum("sal")).head().getDouble(0) == (1 to 97).map(_ * 10.0).sum)
  }
}
