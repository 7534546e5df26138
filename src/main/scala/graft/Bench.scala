package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints ONE JSON line:
  *   {"metric":"total","value":<sec>,"unit":"sec","queries":{...},"sf":...,
  *    "dedup_scaling":{...}}
  *
  * Two parts:
  *  1. per-query wall time for every SparkEntry query at `local[$CPUS]`
  *     (default 32) over SPARK_GRAFT_SF_DIR;
  *  2. north-rule scaling evidence: the full near-dup pipeline over a
  *     deterministic synthetic pages corpus run at local[8] and local[32]
  *     on the SAME input — docs/sec at both parallelism levels plus
  *     strong-scaling efficiency throughput(4N) / (4 * throughput(N))
  *     (the in-sandbox substitute for N vs 4N executors; BASELINE.md).
  *
  * Disable part 2 with SPARK_GRAFT_SCALING=0 (it adds ~2 session cycles).
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def timed[T](f: => T): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val scaling = sys.env.getOrElse("SPARK_GRAFT_SCALING", "1") == "1"
    val benchDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "40000").toInt

    // ---- part 1: query timings
    var spark = session(cpus)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val sec = try timed(fn(spark, sfDir).count()) catch { case _: Throwable => -1.0 }
      name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum

    // ---- part 2: dedup pipeline throughput at two parallelism levels
    val scalingJson = if (!scaling) "null" else {
      val pages = graft.core.WebPages.generate(benchDocs, 42L)
      def runPipeline(s: SparkSession, cores: Int): Double = {
        val work = java.nio.file.Files.createTempDirectory(s"graft-bench-$cores").toString
        val df = s.createDataFrame(s.sparkContext.parallelize(pages, cores * 2))
        val sec = timed {
          graft.pipeline.NearDupPipeline.run(s, df,
            graft.pipeline.NearDupPipeline.Config(workDir = work)).clusters.count()
        }
        // clean temp outputs so repeated benches don't accumulate
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
        sec
      }
      spark.stop()
      val s8 = session(8)
      val sec8 = runPipeline(s8, 8)
      s8.stop()
      val s32 = session(32)
      val sec32 = runPipeline(s32, 32)
      val tp8 = benchDocs / sec8
      val tp32 = benchDocs / sec32
      val eff = tp32 / (4.0 * tp8)
      spark = s32
      f"""{"docs":$benchDocs,"local8_sec":$sec8%.2f,"local8_docs_per_sec":$tp8%.1f,""" +
        f""""local32_sec":$sec32%.2f,"local32_docs_per_sec":$tp32%.1f,""" +
        f""""scaling_efficiency_8_to_32":$eff%.3f}"""
    }

    val totalStr = f"$total%.3f"
    println(s"""{"metric":"total","value":$totalStr,"unit":"sec","queries":$qs,"sf":"$sfDir","dedup_scaling":$scalingJson}""")
    spark.stop()
  }
}
