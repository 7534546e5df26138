package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Storage seam for pipeline stage tables (SURVEY.md §7 hard part 4).
  *
  * The pipeline's resume logic is written against this trait only: a stage
  * is recomputed unless a committed snapshot exists whose fingerprint
  * (pipeline Config hash) matches. The sandbox realization is parquet dirs
  * with a fingerprint marker file; the production realization is an Iceberg
  * catalog where `commit` is the table commit and `committedFingerprint`
  * reads the snapshot's summary properties — the pipeline code is identical.
  */
trait TableIO {
  def read(table: String): DataFrame
  /** Write the full table content (stage output). NOT yet committed. */
  def overwrite(table: String, df: DataFrame): Unit
  /** Append rows (metrics/lineage table). Appends are self-committing. */
  def append(table: String, df: DataFrame): Unit
  def exists(table: String): Boolean
  /** Mark `table` committed under `fingerprint` (atomic wrt `committedFingerprint`). */
  def commit(table: String, fingerprint: String): Unit
  /** The fingerprint the table was committed under, if committed. */
  def committedFingerprint(table: String): Option[String]
}

/** Parquet-directory realization: one dir per table under `root`;
  * the commit marker is `_GRAFT_COMMIT` holding the fingerprint (written
  * after the parquet job's own `_SUCCESS`, read-checked on resume — a
  * changed Config therefore invalidates previously committed stages
  * instead of silently reusing them). */
class ParquetTableIO(spark: SparkSession, root: String) extends TableIO {
  import org.apache.hadoop.fs.Path
  private val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def dir(table: String) = new Path(s"$root/$table")
  private def marker(table: String) = new Path(s"$root/$table/_GRAFT_COMMIT")

  override def read(table: String): DataFrame = spark.read.parquet(s"$root/$table")
  override def overwrite(table: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(s"$root/$table")
  override def append(table: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).parquet(s"$root/$table")
  override def exists(table: String): Boolean = fs.exists(dir(table))

  override def commit(table: String, fingerprint: String): Unit = {
    val out = fs.create(marker(table), true)
    try out.write(fingerprint.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  override def committedFingerprint(table: String): Option[String] = {
    val m = marker(table)
    if (!fs.exists(m) || !fs.exists(new Path(s"$root/$table/_SUCCESS"))) None
    else {
      val in = fs.open(m)
      try {
        val bytes = new Array[Byte](fs.getFileStatus(m).getLen.toInt)
        in.readFully(bytes)
        Some(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
      } finally in.close()
    }
  }
}
