package graft.spark

import graft.core.WebPages
import graft.pipeline.NearDupPipeline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** End-to-end north-rule pipeline correctness: dup-pair recall >= 0.99
  * against the brute-force truth oracle at the reference config, the
  * byte-identical extraction invariant, and exact resume from the last
  * committed stage snapshot. */
class NearDupPipelineSpec extends AnyFunSuite with SparkSuiteBase {

  private def pagesDf(n: Int, seed: Long): (DataFrame, Set[(String, String, String)]) = {
    val pages = WebPages.generate(n, seed)
    val truth = WebPages.truthPairs(pages)
    val df = spark.createDataFrame(spark.sparkContext.parallelize(pages, 8))
    (df, truth)
  }

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft-$tag").toString

  test("pipeline recall >= 0.99 vs brute-force truth at reference config") {
    val (df, truth) = pagesDf(600, 42L)
    assert(truth.nonEmpty)
    val cfg = NearDupPipeline.Config(workDir = tmpDir("pipe"))
    val res = NearDupPipeline.run(spark, df, cfg)

    import spark.implicits._
    val truthDf = truth.toSeq.toDF("url_a", "url_b", "kind")
    val r = NearDupPipeline.recall(res.clusters, truthDf)
    assert(r >= 0.99, s"dup-pair recall $r < 0.99 (truth=${truth.size} pairs)")

    // no-overmerge sanity: intra-cluster pairs should be mostly true dups
    // (transitive closure can add a few, but clusters must not collapse)
    val nClusters = res.clusters.select("component").distinct().count()
    assert(nClusters > 300, s"suspiciously few clusters: $nClusters")
  }

  test("extraction invariant enforced: corrupted html fails loudly") {
    val (df, _) = pagesDf(50, 1L)
    val bad = df.withColumn("html",
      when(col("url").endsWith("/p/3"), lit("<p>tampered</p>".getBytes))
        .otherwise(col("html")))
    val cfg = NearDupPipeline.Config(workDir = tmpDir("bad"))
    val e = intercept[Exception] {
      NearDupPipeline.run(spark, bad, cfg).clusters.count()
    }
    assert(e.getMessage != null)
  }

  test("resume: re-run skips committed stages and reproduces identical clusters") {
    val (df, _) = pagesDf(300, 9L)
    val dir = tmpDir("resume")
    // pinned input snapshot id (the production Iceberg path): the resume
    // run below passes an EMPTY frame to prove stages are read, not
    // recomputed — without the pin the input-identity scan would
    // (correctly) invalidate them
    val cfg = NearDupPipeline.Config(workDir = dir, inputSnapshotId = Some("snap-1"))

    val first = NearDupPipeline.run(spark, df, cfg)
    val firstClusters = first.clusters.orderBy("url").collect().map(r => (r.getString(0), r.getLong(2)))

    // simulate a failure after edges_* committed: delete the cluster stages
    def rm(stage: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/$stage")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    rm("clusters"); rm("cluster_stats")

    // resume with an EMPTY input frame: committed stages must be read, not
    // recomputed (the real resume path reads only workDir state), and the
    // recomputed tail must match the first run bit-for-bit.
    val emptyPages = df.limit(0)
    val second = NearDupPipeline.run(spark, emptyPages, cfg)
    val secondClusters = second.clusters.orderBy("url").collect().map(r => (r.getString(0), r.getLong(2)))
    assert(secondClusters.sameElements(firstClusters), "resume changed cluster assignments")

    // lineage table has one snapshot row set per stage
    val stages = second.metrics.select("stage").distinct().collect().map(_.getString(0)).toSet
    assert(stages == Set("extracted", "edges_exact", "edges_minhash",
      "edges_simhash", "edges_substring", "clusters", "cluster_stats"))
  }

  test("resume: changed config invalidates committed stages (fingerprint mismatch)") {
    val (df, _) = pagesDf(200, 3L)
    val dir = tmpDir("fp")
    val cfg = NearDupPipeline.Config(workDir = dir, inputSnapshotId = Some("snap-1"))
    NearDupPipeline.run(spark, df, cfg).clusters.count()

    // same workDir, different jaccard threshold, EMPTY input: if the stages
    // were (wrongly) reused, the clusters of the first run would come back;
    // the fingerprint mismatch must force recompute, which over an empty
    // input yields zero clusters
    val cfg2 = cfg.copy(jaccardThreshold = 0.5)
    val rerun = NearDupPipeline.run(spark, df.limit(0), cfg2)
    assert(rerun.clusters.count() == 0, "stale stage outputs reused despite config change")

    // same config resumes: stages are now committed under cfg2 (with empty
    // outputs), so re-running cfg2 with the FULL input must still read the
    // committed empty snapshots rather than recompute
    val resumed = NearDupPipeline.run(spark, df, cfg2)
    assert(resumed.clusters.count() == 0, "committed stages were recomputed despite matching fingerprint")
  }

  test("resume: same workDir + config but DIFFERENT input recomputes all stages") {
    val (df, _) = pagesDf(150, 13L)
    val dir = tmpDir("inputfp")
    val cfg = NearDupPipeline.Config(workDir = dir) // no snapshot pin: identity is computed
    NearDupPipeline.run(spark, df, cfg).clusters.count()

    // a disjoint 50-page corpus against the same workDir: stale reuse
    // would return the 150-row cluster table of the first run
    val (df2, _) = pagesDf(50, 99L)
    val second = NearDupPipeline.run(spark, df2, cfg)
    assert(second.clusters.count() == 50,
      "committed stages reused despite a different input table")
  }

  test("metrics come from the write job: one read per stage, schema + values intact") {
    val (df, _) = pagesDf(200, 17L)
    val dir = tmpDir("tap")
    val reads = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    val io = new graft.pipeline.ParquetTableIO(spark, dir) {
      override def read(table: String): DataFrame = {
        reads.synchronized { reads(table) += 1 }
        super.read(table)
      }
    }
    val cfg = NearDupPipeline.Config(workDir = dir)
    val res = NearDupPipeline.run(spark, df, cfg, io)
    val nClusters = res.clusters.count()

    // r2 re-read every stage output for metrics (2 reads of `extracted`
    // per fresh run); the tap must keep it at exactly one
    assert(reads("extracted") == 1, s"extracted read ${reads("extracted")}x")

    val m = res.metrics
    assert(m.columns.toSeq == Seq(
      "stage", "partition_id", "rows", "sketch", "snapshot_id", "config_fp", "ts"))
    // tap row counts must equal the written tables' true counts
    import org.apache.spark.sql.functions._
    val byStage = m.groupBy("stage").agg(sum("rows").as("rows")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStage("extracted") == 200, byStage.toString)
    assert(byStage("clusters") == nClusters, byStage.toString)
  }

  test("collision-safe ids: resolver splits synthetic collisions; flag-on pipeline parity") {
    import spark.implicits._
    // three docs share id 100 (synthetic 64-bit collision); id2 breaks ties
    val rows = Seq((100L, 7L, "a"), (100L, 3L, "b"), (100L, 9L, "c"), (200L, 1L, "d"))
      .toDF("id", "id2", "url")
    def resolve() = NearDupPipeline.resolveIdCollisions(rows, "id", "id2")
      .select("url", "id").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val resolved = resolve()
    assert(resolved.values.toSet.size == 4, s"ids not distinct: $resolved")
    assert(resolved("b") == 100L, "min-tie member must keep the original id")
    assert(resolved("d") == 200L, "collision-free id must not change")
    assert(resolve() == resolved, "remap not deterministic")

    // on a collision-free corpus the flag must not change any output
    val (df, _) = pagesDf(150, 31L)
    val off = NearDupPipeline.run(spark, df,
        NearDupPipeline.Config(workDir = tmpDir("cid-off")))
      .clusters.orderBy("url").collect().map(_.toSeq)
    val on = NearDupPipeline.run(spark, df,
        NearDupPipeline.Config(workDir = tmpDir("cid-on"), collisionSafeIds = true))
      .clusters.orderBy("url").collect().map(_.toSeq)
    assert(on.sameElements(off), "collisionSafeIds changed collision-free output")
  }

  test("snapshot history: pinning an older committed snapshot reproduces its clusters") {
    val (df, _) = pagesDf(150, 23L)
    val dir = tmpDir("snap")
    val cfg = NearDupPipeline.Config(workDir = dir, inputSnapshotId = Some("in-1"))
    val firstClusters = NearDupPipeline.run(spark, df, cfg)
      .clusters.orderBy("url", "id").collect().map(_.toSeq)

    // a config change commits a SECOND clusters snapshot (full recompute)
    NearDupPipeline.run(spark, df, cfg.copy(jaccardThreshold = 0.5)).clusters.count()

    val io = new graft.pipeline.ParquetTableIO(spark, dir)
    val snaps = io.snapshots("clusters")
    assert(snaps.size == 2, s"expected 2 committed snapshots: $snaps")
    assert(snaps.map(_._2).distinct.size == 2, s"fingerprints should differ: $snaps")
    // head reads the new run; the PINNED older snapshot is byte-stable
    val pinned = io.readAt("clusters", snaps.head._1)
      .orderBy("url", "id").collect().map(_.toSeq)
    assert(pinned.sameElements(firstClusters),
      "older snapshot does not reproduce its run's clusters")
  }

  test("skew stress: one dominant template (2000 copies) stays linear and clusters whole") {
    // a boilerplate page repeated 2000x under distinct urls — every lane's
    // buckets for it are hot (over maxBucketSize=64), so candidate
    // generation must take the star path, never C(n,2): 2000 copies emit
    // O(2000) edges per lane instead of ~2M. With clusters coming out
    // right, this is the salted/capped collection's end-to-end oracle.
    val (df, _) = pagesDf(100, 5L)
    val template = WebPages.generate(1, 77L).head
    import spark.implicits._
    val copies = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0 until 2000).map(i => template.copy(url = s"https://tpl.example/p/$i")), 8))
    val cfg = NearDupPipeline.Config(workDir = tmpDir("skew"))
    val res = NearDupPipeline.run(spark, df.unionByName(copies), cfg)

    // the template pages form exactly one 2000-member component
    val tplComponents = res.clusters
      .filter(col("url").startsWith("https://tpl.example/"))
      .groupBy("component").count().collect()
    assert(tplComponents.length == 1, s"template split into ${tplComponents.length} components")
    assert(tplComponents.head.getLong(1) == 2000)

    // and the edge stages stayed linear in the group size
    val io = new graft.pipeline.ParquetTableIO(spark, cfg.workDir)
    val edgeCounts = Seq("edges_exact", "edges_minhash", "edges_simhash", "edges_substring")
      .map(st => io.read(st).count())
    assert(edgeCounts.forall(_ < 20000), s"edge blowup: $edgeCounts")
  }

  test("cluster_stats sketches: sizes and distinct-url estimates agree") {
    val (df, _) = pagesDf(300, 11L)
    val cfg = NearDupPipeline.Config(workDir = tmpDir("stats"))
    val res = NearDupPipeline.run(spark, df, cfg)
    val rows = res.clusterStats.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val size = r.getAs[Long]("size")
      val urls = r.getAs[Long]("distinct_urls")
      val ids = r.getAs[Long]("distinct_ids")
      // theta below nominal entries is exact (k-minimum-values, no sampling)
      assert(ids == size, s"component ${r.get(0)}: theta=$ids size=$size")
      // hll at tiny cardinality: register-estimator, allow 3-sigma + rounding
      val tol = math.max(1.0, 3 * 1.04 / math.sqrt(1 << graft.core.HllSketch.DefaultLgK) * size)
      assert(math.abs(urls - size) <= tol, s"component ${r.get(0)}: hll=$urls size=$size")
    }
  }
}
