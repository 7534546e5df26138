package graft.spark

import graft.core.SplitMix64
import graft.operators.AnnSearch
import org.scalatest.funsuite.AnyFunSuite

/** Recall oracles for the embedding near-dup LSH lane — the r1 verdict's
  * top item: the lane must carry a recall assertion vs brute-force truth so
  * a low-recall configuration can never ship silently again. */
class AnnSearchSpec extends AnyFunSuite with SparkSuiteBase {

  /** Deterministic isotropic unit vectors (Box-Muller over SplitMix64). */
  private def randomVecs(n: Int, dim: Int, seed: Long): Seq[(Long, Array[Double])] =
    (0 until n).map { id =>
      val v = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        val h1 = SplitMix64.mix(seed ^ (id.toLong << 20) ^ i.toLong)
        val h2 = SplitMix64.mix(h1 + 0x9E3779B97F4A7C15L)
        val u1 = ((h1 >>> 11).toDouble + 1.0) / 9007199254740993.0
        val u2 = (h2 >>> 11).toDouble / 9007199254740992.0
        v(i) = math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
        i += 1
      }
      val norm = math.sqrt(v.map(x => x * x).sum)
      (id.toLong, v.map(_ / norm))
    }

  private def toDf(vecs: Seq[(Long, Array[Double])]) = {
    import spark.implicits._
    vecs.toDF("id", "v")
  }

  test("tune: recall formula meets target at the threshold, selectivity maximal") {
    for (thr <- Seq(0.3, 0.4, 0.6, 0.85, 0.95); target <- Seq(0.9, 0.99)) {
      val (r, b) = AnnSearch.tune(thr, target, 128)
      val p = AnnSearch.collisionProb(thr)
      val recall = 1.0 - math.pow(1.0 - math.pow(p, r), b)
      assert(recall >= target, s"tune($thr,$target): recall $recall at (r=$r,b=$b)")
      assert(b <= 128)
      // one more row per band would blow the table budget (max selectivity),
      // unless we're at the 32-bit packing limit already
      val bNext = math.ceil(math.log1p(-target) / math.log1p(-math.pow(p, r + 1)))
      assert(r == 32 || bNext > 128,
        s"tune($thr,$target) not maximal: r+1=${r + 1} needs $bNext tables")
    }
  }

  test("low-threshold isotropic regime: recall >= 0.9 vs brute force at cos 0.4") {
    // isotropic vectors, dim 32 => pair cosines ~ N(0, 1/sqrt(32)); the
    // cos>=0.4 tail is the hardest case for sign-LSH (pairs barely above
    // threshold). This is exactly the regime where r1 shipped ~3% recall.
    val vecs = randomVecs(400, 32, 7L)
    val truth = AnnSearch.bruteForcePairs(vecs, 0.4)
    assert(truth.size > 100, s"weak truth set: ${truth.size}")

    val got = AnnSearch.nearDupPairs(toDf(vecs), "id", "v", 0.4, targetRecall = 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (truth & got).size.toDouble / truth.size
    assert(recall >= 0.9, s"recall $recall < 0.9 (${(truth & got).size}/${truth.size})")
    // verify step guarantees zero false positives
    assert((got -- truth).isEmpty, s"false positives: ${(got -- truth).take(5)}")
  }

  test("high-threshold near-dup regime: exact pair set at cos 0.9") {
    // planted near-dups: every 4th vector re-appears slightly perturbed —
    // the actual web-embedding dedup regime. At this margin the tuned
    // banding misses with probability ~1e-10 per pair, so the result must
    // EQUAL the brute-force truth.
    val base = randomVecs(300, 32, 13L)
    val planted = base.filter(_._1 % 4 == 0).map { case (id, v) =>
      val w = v.zipWithIndex.map { case (x, i) => x + 0.05 * math.sin(id * 31.0 + i) }
      val norm = math.sqrt(w.map(x => x * x).sum)
      (id + 100000L, w.map(_ / norm))
    }
    val all = base ++ planted
    val truth = AnnSearch.bruteForcePairs(all, 0.9)
    assert(truth.size >= planted.size, s"planted pairs missing from truth: ${truth.size}")

    val got = AnnSearch.nearDupPairs(toDf(all), "id", "v", 0.9, targetRecall = 0.99)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == truth, s"missed=${(truth -- got).take(5)} extra=${(got -- truth).take(5)}")
  }

  test("brute-force top-k matches exact cosine ordering") {
    val vecs = randomVecs(100, 16, 3L)
    val df = toDf(vecs)
    val got = AnnSearch.bruteForceTopK(df, df.filter(org.apache.spark.sql.functions.col("id") < 3), "id", "v", k = 4)
      .select("query_id", "neighbor_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // direct local oracle
    val local = (0L until 3L).flatMap { q =>
      val qv = vecs(q.toInt)._2
      vecs.filter(_._1 != q)
        .map { case (id, v) =>
          var dot = 0.0; var na = 0.0; var nb = 0.0
          var i = 0
          while (i < qv.length) { dot += qv(i) * v(i); na += qv(i) * qv(i); nb += v(i) * v(i); i += 1 }
          (id, dot / (math.sqrt(na) * math.sqrt(nb)))
        }
        .sortBy { case (id, c) => (-c, id) }.take(4).zipWithIndex
        .map { case ((id, _), rnk) => (q, id, rnk + 1) }
    }.toSet
    assert(got == local)
  }

  test("int8 quantization: element-exact vs local reference; cosine survives within 0.02") {
    import org.apache.spark.sql.functions._
    val vecs = randomVecs(80, 64, seed = 99L) :+ (999L, Array.fill(64)(0.0))
    val df = toDf(vecs)
    val got = AnnSearch.quantizeInt8(df, "id", "v")
      .collect().map(r => (r.getLong(0),
        (r.getDouble(1), r.getSeq[Int](2).toArray))).toMap
    vecs.foreach { case (id, v) =>
      val m = v.map(math.abs).max
      val q = if (m == 0.0) v.map(_ => 0)
        else v.map(x => math.floor(x * 127.0 / m + 0.5).toInt)
      assert(got(id)._1 == m && java.util.Arrays.equals(got(id)._2, q), s"vec $id")
      assert(got(id)._2.forall(x => x >= -127 && x <= 127))
    }
    // quantized cosine tracks float cosine (scales cancel)
    val q = AnnSearch.quantizeInt8(df, "id", "v").select(col("vec_id"), col("qvec"))
    val pairs = q.withColumnRenamed("vec_id", "ia").withColumnRenamed("qvec", "qa")
      .join(q.withColumnRenamed("vec_id", "ib").withColumnRenamed("qvec", "qb"),
        col("ia") + 1 === col("ib"))
      .select(col("ia"), col("ib"),
        AnnSearch.quantizedCosine(col("qa"), col("qb")).as("cq"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val byId = vecs.toMap
    pairs.foreach { case ((ia, ib), cq) =>
      if (ib != 999L) {
        val cf = AnnSearch.cosineKernel(byId(ia), byId(ib))
        assert(math.abs(cq - cf) < 0.02, s"pair ($ia,$ib): cq=$cq cf=$cf")
      } else assert(cq == 0.0) // zero vector pins the guard branch
    }
  }

  test("CosineSimilarity codegen expression matches the Scala kernel; null in, null out") {
    val sq = spark
    import sq.implicits._
    graft.spark.GraftFunctions.register(sq)
    val rnd = new scala.util.Random(3)
    val rows = Seq.tabulate(50) { i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian()), Array.fill(16)(rnd.nextGaussian()))
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select($"id", graft.operators.AnnSearch.cosine($"a", $"b").as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (id, a, b) =>
      val want = graft.operators.AnnSearch.cosineKernel(a, b)
      assert(math.abs(got(id) - want) < 1e-12, s"id=$id got=${got(id)} want=$want")
    }
    // SQL surface + null discipline
    df.createOrReplaceTempView("cs_vecs")
    val viaSql = sq.sql("SELECT id, cosine_sim(a, b) AS c FROM cs_vecs ORDER BY id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaSql == got)
    val withNull = sq.sql(
      "SELECT cosine_sim(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d, 2.0d)) AS c").collect()
    assert(withNull.head.isNullAt(0))
    // zero-norm convention matches the kernel (0.0, not NaN)
    val zero = sq.sql("SELECT cosine_sim(array(0.0d, 0.0d), array(1.0d, 2.0d)) AS c")
      .collect().head.getDouble(0)
    assert(zero == 0.0)
  }
}
