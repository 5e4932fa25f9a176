package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Similarity, Skew}
import graft.sources.Checkpoints

class ScaleOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("salted join equals plain join") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey", "l_quantity")
    val p = Tables.part(spark, sf).select("p_partkey", "p_brand")
    val plain = li.join(p, li("l_partkey") === p("p_partkey"))
      .groupBy("p_brand").agg(sum("l_quantity").as("q"))
    val salted = Skew.saltedJoin(
        li.withColumnRenamed("l_partkey", "p_partkey"), p, "p_partkey",
        salts = 7, disambiguator = col("l_orderkey"))
      .groupBy("p_brand").agg(sum("l_quantity").as("q"))
    assert(plain.except(salted).isEmpty && salted.except(plain).isEmpty)
  }

  test("two-phase agg equals single-phase") {
    val ev = Tables.events(spark, sf)
    val direct = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
    val twoPhase = Skew.twoPhaseAgg(ev, "event_type", salts = 5,
      disambiguator = col("event_id"),
      partial = Seq(count(lit(1)).as("pn")),
      finalAgg = Seq(sum("pn").as("n")))
    assert(direct.except(twoPhase).isEmpty && twoPhase.except(direct).isEmpty)
  }

  test("checkpoints advance atomically and drive incremental reads") {
    val dir = Files.createTempDirectory("graft_ckpt").toString
    val ck = new Checkpoints(dir)
    assert(ck.load("job1").isEmpty)
    val ev = Tables.events(spark, sf)
    var firstBatch = 0L
    ck.advance("job1", "-1") { last =>
      val batch = ev.filter(col("event_id") > last.toLong)
      firstBatch = batch.count()
      batch.agg(max("event_id")).head().getLong(0).toString
    }
    assert(firstBatch == ev.count())
    // second cycle: nothing new
    ck.advance("job1", "-1") { last =>
      assert(ev.filter(col("event_id") > last.toLong).count() == 0)
      last
    }
    assert(ck.load("job1").get.toLong == ev.agg(max("event_id")).head().getLong(0))
  }

  test("prebucketed lsh ann equals the inline form") {
    val emb = Tables.embeddings(spark, sf).filter($"vec_id" =!= 0)
    val q = Tables.embeddings(spark, sf).filter($"vec_id" === 0)
      .select($"embedding").head().getSeq[Float](0).map(_.toDouble)
    val inline = Similarity.lshTopK(emb, "vec_id", "embedding", 64, q, 10,
        numPlanes = 12, probeHamming = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val bucketed = Similarity.bucketize(emb, "vec_id", "embedding", 64, 12)
    val pre = Similarity.lshTopKPrebucketed(bucketed, q, 10, 64,
        numPlanes = 12, probeHamming = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(inline == pre, s"$inline vs $pre")
  }

  test("ivf ann has decent recall vs brute force") {
    val emb = Tables.embeddings(spark, sf).filter($"vec_id" =!= 0)
    val q = Tables.embeddings(spark, sf).filter($"vec_id" === 0)
      .select($"embedding").head().getSeq[Float](0).map(_.toDouble)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
      .select("id").collect().map(_.getLong(0)).toSet
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", q, 10,
        nlist = 8, nprobe = 4)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ivf.intersect(brute).size >= 5, s"recall too low: $ivf vs $brute")
  }
}
