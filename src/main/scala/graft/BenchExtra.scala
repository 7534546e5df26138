package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement helper — NOT part of the frozen driver
  * contract (`Bench`/`Verify` are untouched). Guide §1: measure first,
  * isolate the computation, capture the plan.
  *
  * Usage (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in Bench):
  *   runMain graft.BenchExtra time <query-regex> [reps]
  *     — per-query wall seconds over `count()` (the driver's action),
  *       all reps printed plus the median, queries sorted by median desc.
  *   runMain graft.BenchExtra noop <query-regex> [reps]
  *     — same but through the noop sink (guide §1.4: every column computed).
  *   runMain graft.BenchExtra plan <query-regex> <outDir> <suffix>
  *     — write `.explain("formatted")` to <outDir>/<query><suffix>.txt.
  */
object BenchExtra {

  /** Session config mirrors the frozen Bench.session so isolation numbers
    * are comparable to driver numbers. */
  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchextra-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.local.dir", graft.spark.Scratch.localDir)
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.scheduler.allocation.file", graft.spark.Scratch.fairPoolsXml)
      .config("spark.file.transferTo", "false")
      .config("spark.shuffle.file.buffer", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.spark.Scratch.warmBlockManager(s)
    s
  }

  private def timed[T](f: => T): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val cmd = args.headOption.getOrElse("time")
    val pattern = if (args.length > 1) args(1) else ".*"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = session(cpus)
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => n.matches(pattern) }

    cmd match {
      case "time" | "noop" =>
        val reps = if (args.length > 2) args(2).toInt else 3
        // warmup sweep at the smallest sf so C2-cold reps don't pollute
        val warmDir = Seq("/root/testdata/sf0.001", sfDir)
          .find(d => new java.io.File(s"$d/documents.parquet").exists())
        warmDir.foreach { d =>
          qs.foreach { case (n, fn) =>
            if (n == "q_pages_pipeline") SparkEntry.resetEntryPipelineWork()
            try fn(spark, d).count()
            catch { case e: Throwable => System.err.println(s"[warm] $n: $e") }
          }
        }
        val results = qs.map { case (name, fn) =>
          spark.sparkContext.setJobDescription(name)
          val times = (1 to reps).map { _ =>
            if (name == "q_pages_pipeline") SparkEntry.resetEntryPipelineWork()
            try timed {
              val df = fn(spark, sfDir)
              if (cmd == "noop")
                df.write.format("noop").mode("overwrite").save()
              else df.count()
            } catch { case e: Throwable =>
              System.err.println(s"[time] $name: $e"); -1.0 }
          }
          spark.sparkContext.setJobDescription(null)
          val ok = times.filter(_ >= 0).sorted
          val med = if (ok.isEmpty) -1.0
            else if (ok.length % 2 == 1) ok(ok.length / 2)
            else (ok(ok.length / 2 - 1) + ok(ok.length / 2)) / 2.0
          (name, med, times)
        }
        println("=== BenchExtra " + cmd + " @ " + sfDir + " cpus=" + cpus + " ===")
        results.sortBy(-_._2).foreach { case (n, med, ts) =>
          println(f"$n%-32s med=$med%8.3f  reps=${ts.map(t => f"$t%.3f").mkString(",")}")
        }
        println(f"TOTAL(median sum) ${results.map(_._2).filter(_ >= 0).sum}%.3f")
      case "plan" =>
        val outDir = args(2)
        val suffix = if (args.length > 3) args(3) else ""
        new java.io.File(outDir).mkdirs()
        qs.foreach { case (name, fn) =>
          try {
            val df = fn(spark, sfDir)
            val s = df.queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
            val w = new java.io.PrintWriter(s"$outDir/$name$suffix.txt")
            try w.write(s) finally w.close()
            println(s"wrote $outDir/$name$suffix.txt")
          } catch { case e: Throwable =>
            System.err.println(s"[plan] $name: $e") }
        }
      case other => sys.error(s"unknown cmd $other")
    }
    spark.stop()
  }
}
