package graft.checkpoint

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Iceberg-shaped table layer: partitioned parquet + an atomic snapshot
  * manifest protocol. No Iceberg runtime ships in /opt/spark/jars
  * (SURVEY.md §7.5 item 1), so the semantics the north rule needs — atomic
  * commit, snapshot pinning, resume — live in this small commit protocol:
  *
  *   table/
  *     data/<stage>-<uuidless deterministic name>/...parquet   (immutable)
  *     _snapshot-N.json    (committed file-list; writers commit by atomic
  *                          rename of a temp manifest — readers pin latest)
  *
  * Matches the reference's per-stage delta flush + MERGE upload semantics
  * (ast/src/builder/streaming.rs:95-130; neo4j MERGE nodes.rs:48-56):
  * a stage's output becomes visible only when its manifest rename lands.
  */
object SnapshotTable {

  private def snapDir(table: String): Path = Paths.get(table)

  def latestSnapshotId(table: String): Option[Int] = {
    val dir = snapDir(table)
    if (!Files.exists(dir)) None
    else {
      val ids = Files
        .list(dir)
        .iterator()
        .asScala
        .map(_.getFileName.toString)
        .collect { case s if s.startsWith("_snapshot-") && s.endsWith(".json") =>
          s.stripPrefix("_snapshot-").stripSuffix(".json").toInt
        }
        .toSeq
      if (ids.isEmpty) None else Some(ids.max)
    }
  }

  /** Commit `df` as a new named data dir + snapshot N+1. The data write is
    * to a location invisible to readers; the snapshot JSON is staged to a
    * temp file and atomically renamed — a killed writer leaves no partial
    * snapshot (resume idempotence suite asserts this).
    */
  def commit(df: DataFrame, table: String, stage: String): Int = {
    val next = latestSnapshotId(table).getOrElse(0) + 1
    val dataPath = s"$table/data/$stage-$next"
    df.write.mode("overwrite").parquet(dataPath)
    val prior = latestSnapshotId(table) // re-read: another writer may have won
    val id = math.max(next, prior.getOrElse(0) + 1)
    val priorFiles = prior
      .map(p => readManifest(table, p))
      .getOrElse(Seq.empty)
    val manifest =
      (priorFiles :+ s"data/$stage-$next") // append-style snapshot lineage
        .distinct
    val json = manifest.map(f => "\"" + f + "\"").mkString("[", ",", "]")
    val tmp = snapDir(table).resolve(s"_snapshot-$id.json.tmp")
    Files.createDirectories(snapDir(table))
    Files.write(tmp, s"""{"snapshot":$id,"files":$json}""".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, snapDir(table).resolve(s"_snapshot-$id.json"),
      StandardCopyOption.ATOMIC_MOVE)
    id
  }

  def readManifest(table: String, id: Int): Seq[String] = {
    val txt = new String(
      Files.readAllBytes(snapDir(table).resolve(s"_snapshot-$id.json")),
      StandardCharsets.UTF_8
    )
    "\"(data/[^\"]+)\"".r.findAllMatchIn(txt).map(_.group(1)).toSeq
  }

  /** Read the latest committed snapshot (union of its data dirs). */
  def read(spark: SparkSession, table: String): Option[DataFrame] =
    latestSnapshotId(table).map { id =>
      val dirs = readManifest(table, id).map(d => s"$table/$d")
      spark.read.parquet(dirs: _*)
    }

  /** Has `stage` already committed into this table? (resume check) */
  def stageCommitted(table: String, stage: String): Boolean =
    latestSnapshotId(table).exists(id =>
      readManifest(table, id).exists(_.startsWith(s"data/$stage-"))
    )
}
