package graft.spark

import graft.operators.{AnnSearch, IvfIndex, SemanticDedup}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SemanticDedupSpec extends AnyFunSuite with SparkSuiteBase {

  private val dim = 16

  /** base unit-ish vectors + a perturbed near-copy (cos ~0.999) of every
    * 5th one under id+1000 — the duplicate truth is exactly those pairs. */
  private def fixture(n: Int, seed: Long): Seq[(Long, Seq[Double])] = {
    val rnd = new scala.util.Random(seed)
    val base = (0 until n).map { i =>
      (i.toLong, Seq.fill(dim)(rnd.nextGaussian()))
    }
    val dups = base.filter(_._1 % 5 == 0).map { case (id, v) =>
      (id + 1000L, v.map(x => x + 0.001 * rnd.nextGaussian()))
    }
    base ++ dups
  }

  test("clusters/survivors match per-cell brute force; injected dups removed") {
    import spark.implicits._
    val rows = fixture(200, 7L)
    val df = rows.toDF("vec_id", "v").repartition(5)
    val thr = 0.95
    val cents = IvfIndex.fitCentroids(df, "vec_id", "v", k = 8, iters = 4)
    val comp = SemanticDedup.clusters(df, "vec_id", "v", cents, thr)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every id labeled; survivors = component representatives
    assert(comp.size == rows.size)
    // brute-force per-cell truth with the same quantizer
    val cells = rows.map { case (id, v) =>
      id -> IvfIndex.nearestCell(v.toArray, cents)
    }.toMap
    val byId = rows.toMap
    val truthPairs = for {
      (a, _) <- rows; (b, _) <- rows
      if a < b && cells(a) == cells(b) &&
        AnnSearch.cosineKernel(byId(a).toArray, byId(b).toArray) >= thr
    } yield (a, b)
    // union-find over truth pairs
    val parent = scala.collection.mutable.Map(rows.map(r => r._1 -> r._1): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    truthPairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val truthComp = rows.map(r => r._1 -> find(r._1)).toMap
    assert(comp == truthComp)
    // the injected near-copies really dedup: every dup id maps to its base
    val removed = comp.filter { case (id, c) => id != c }
    assert(removed.nonEmpty)
    rows.filter(_._1 >= 1000L).foreach { case (id, _) =>
      if (cells(id) == cells(id - 1000L)) assert(comp(id) == comp(id - 1000L))
    }
    // survivors: exactly the representatives, corpus minus removed
    val surv = SemanticDedup.survivors(df, "vec_id", "v", cents, thr)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(surv == comp.values.toSet)
    assert(surv.size + removed.size == rows.size)
  }

  test("cell cap engages the star fallback but keeps duplicate groups connected") {
    import spark.implicits._
    // one tight bundle of 30 mutual near-dups (all pairwise cos ~1) plus
    // isotropic noise: with a tiny cap the bundle's cell overflows, the
    // star fallback emits hub edges only — the GROUP must still come out
    // whole (clustering-equivalent), even though pair lists differ.
    val rnd = new scala.util.Random(11L)
    val hubV = Seq.fill(dim)(rnd.nextGaussian())
    val bundle = (0 until 30).map(i =>
      ((100 + i).toLong, hubV.map(x => x + 0.0005 * rnd.nextGaussian())))
    val noise = (0 until 60).map(i => ((200 + i).toLong, Seq.fill(dim)(rnd.nextGaussian())))
    val rows = bundle ++ noise
    val df = rows.toDF("vec_id", "v").repartition(4)
    val cents = IvfIndex.fitCentroids(df, "vec_id", "v", k = 4, iters = 3)
    val comp = SemanticDedup.clusters(df, "vec_id", "v", cents, 0.95, maxCellSize = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bundleComps = bundle.map(b => comp(b._1)).toSet
    assert(bundleComps.size == 1, s"bundle split: $bundleComps")
    assert(bundleComps.head == 100L)
    // noise vectors stay singletons (isotropic gaussians never hit 0.95)
    noise.foreach { case (id, _) => assert(comp(id) == id) }
  }
}
