package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets.UTF_8
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}
import graft.ops.{Merge, Pipeline}

/** A minimal transactional table format over plain parquet — the
  * manifest/snapshot commit protocol that gives the K1 merge path the
  * atomicity the reference gets per-row from SQLite (and plain
  * dynamic-partition overwrite lacks: a failed overwrite there leaves
  * the table half-rewritten).
  *
  * Layout:
  * {{{
  *   table/
  *     data/<commit-uuid>/<pcol>=<value>/part-*.parquet   (immutable)
  *     _manifests/v00000042.manifest                      (one per commit)
  * }}}
  *
  * Protocol (Delta-lite):
  *  - a commit first writes NEW data directories (never touching old
  *    ones), then publishes a manifest listing the snapshot's COMPLETE
  *    directory set, via write-temp + atomic rename-no-overwrite;
  *  - readers list `_manifests` and take the highest version — a crash
  *    anywhere before the rename leaves only unreferenced orphan data,
  *    and the previous snapshot stays live;
  *  - two racing writers target the same next version; the rename makes
  *    exactly one win — the loser gets a ConcurrentCommitException and
  *    retries on top of the winner's snapshot;
  *  - old manifests remain readable (time travel) until `vacuum`.
  *
  * Scale posture: a merge commit rewrites only the partitions the batch
  * touches and re-references every untouched directory from the prior
  * manifest, so commit cost tracks the touched-partition volume plus one
  * small manifest file — same economics as Merge.upsertIntoPath but
  * atomic. Partition values ride in directory names; the read path
  * re-injects the column by parsing `input_file_name()` (codegen'd
  * regexp on the scan, no extra join), and partition pruning happens
  * manifest-side before the scan ever starts.
  */
object Snapshot {

  final class ConcurrentCommitException(msg: String) extends RuntimeException(msg)

  /** Spark escapes partition values in directory names (':' → '%3A',
    * null → __HIVE_DEFAULT_PARTITION__, see
    * ExternalCatalogUtils.escapePathName); every comparison between an
    * incoming VALUE and a directory SUFFIX must happen on one side of
    * that encoding. Driver-side we unescape with the same utility Spark
    * wrote the path with.
    */
  private val NullPartitionName =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.DEFAULT_PARTITION_NAME

  private def escapeValue(v: String): String =
    if (v == null) NullPartitionName
    else org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(v)

  private def unescapeValue(suffix: String): String =
    if (suffix == NullPartitionName) null
    else org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.unescapePathName(suffix)

  /** List a directory's entries eagerly, closing the OS handle —
    * Files.list streams otherwise leak one descriptor per call in a
    * long-running driver doing many commits/reads.
    */
  private def listDir(p: Path): Seq[Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toSeq finally s.close()
  }

  /** One snapshot: the complete set of data directories (absolute),
    * partition column name + catalog type ("" when unpartitioned), and
    * the DATA schema (partition column excluded) as StructType JSON —
    * the source of truth for reads, so directories written before a
    * schema evolution read back with the evolved schema (absent
    * columns null-fill at scan time).
    */
  final case class Manifest(version: Long, partitionCol: String,
                            partitionType: String, dataSchemaJson: String,
                            dirs: Seq[String]) {
    def dataSchema: StructType =
      DataType.fromJson(dataSchemaJson).asInstanceOf[StructType]
  }

  private def manifestDir(table: String): Path = Paths.get(table, "_manifests")

  private def manifestPath(table: String, v: Long): Path =
    manifestDir(table).resolve(f"v$v%08d.manifest")

  private def parseVersion(name: String): Option[Long] =
    if (name.startsWith("v") && name.endsWith(".manifest"))
      name.stripPrefix("v").stripSuffix(".manifest").toLongOption
    else None

  def versions(table: String): Seq[Long] = {
    val dir = manifestDir(table)
    if (!Files.isDirectory(dir)) Seq.empty
    else listDir(dir)
      .flatMap(p => parseVersion(p.getFileName.toString)).sorted
  }

  def latestVersion(table: String): Option[Long] = versions(table).lastOption

  def readManifest(table: String, v: Long): Manifest = {
    val lines = Files.readAllLines(manifestPath(table, v), UTF_8).asScala.toSeq
    val header = lines.head.split("\t", -1)
    require(header.length == 3 && header(0).toLong == v,
      s"corrupt manifest v$v: ${lines.head}")
    Manifest(v, header(1), header(2), lines(1), lines.drop(2))
  }

  private def writeManifest(table: String, m: Manifest): Unit = {
    Files.createDirectories(manifestDir(table))
    val body = (Seq(s"${m.version}\t${m.partitionCol}\t${m.partitionType}",
      m.dataSchemaJson) ++ m.dirs).mkString("", "\n", "\n")
    val tmp = manifestDir(table).resolve(
      s".tmp-${java.util.UUID.randomUUID().toString}")
    Files.write(tmp, body.getBytes(UTF_8))
    // Publish = hard-link the fully-written temp onto the version name:
    // link(2) atomically fails if the target exists, so exactly one
    // writer wins a version. (POSIX rename(2) — ATOMIC_MOVE — would
    // silently REPLACE the winner's manifest; on object stores / HDFS
    // the equivalent primitive is rename-no-overwrite / put-if-absent.)
    try Files.createLink(manifestPath(table, m.version), tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        throw new ConcurrentCommitException(
          s"version ${m.version} of $table was committed concurrently")
    } finally Files.deleteIfExists(tmp)
  }

  /** Write a NEW data directory set for `df` and return the dirs —
    * nothing is published until the manifest rename.
    */
  private def writeData(df: DataFrame, table: String,
                        partitionCol: Option[String]): Seq[String] = {
    val commitId = java.util.UUID.randomUUID().toString
    val dataRoot = Paths.get(table, "data", commitId)
    partitionCol match {
      case Some(pc) =>
        df.write.partitionBy(pc).parquet(dataRoot.toString)
        listDir(dataRoot)
          .filter(p => Files.isDirectory(p) && p.getFileName.toString.contains("="))
          .map(_.toString).sorted
      case None =>
        df.write.parquet(dataRoot.toString)
        Seq(dataRoot.toString)
    }
  }

  /** Publish `df` as the table's next snapshot, REPLACING prior content
    * (the SCD-1 dimension-overwrite shape, K2). Returns the version.
    */
  def commit(df: DataFrame, table: String,
             partitionCol: Option[String] = None): Long = {
    val (pcName, pcType) = partitionCol match {
      case Some(pc) => (pc, df.schema(pc).dataType.catalogString)
      case None => ("", "")
    }
    val dataSchema = StructType(df.schema.filterNot(_.name == pcName))
    val dirs = writeData(df, table, partitionCol)
    val next = latestVersion(table).getOrElse(0L) + 1
    writeManifest(table, Manifest(next, pcName, pcType, dataSchema.json, dirs))
    next
  }

  /** Read a snapshot (latest by default; any retained version for time
    * travel). The partition column is re-injected from the directory
    * names on the scan — one codegen'd regexp, no join, no shuffle.
    */
  def read(spark: SparkSession, table: String,
           version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(table)).getOrElse(
      throw new IllegalArgumentException(s"$table has no committed snapshot"))
    val m = readManifest(table, v)
    if (m.dirs.isEmpty)
      throw new IllegalArgumentException(s"$table v$v is an empty snapshot")
    // explicit schema: directories predating a schema evolution
    // null-fill the columns they lack
    val df = spark.read.schema(m.dataSchema).parquet(m.dirs: _*)
    if (m.partitionCol.isEmpty) df
    else injectPartitionCol(df, m.partitionCol, m.partitionType)
  }

  /** Re-inject the partition column from the directory name on the scan —
    * one codegen'd regexp + percent-decode, no join, no shuffle. The
    * suffix extracted from input_file_name() carries TWO escape layers:
    * Spark's partition escaping (':' → %3A) underneath the URI encoding
    * input_file_name applies to the whole path ('%' → %25, space → %20).
    * Decode twice; before each pass protect literal '+', which neither
    * escaper touches but url_decode would turn into a space. A literal
    * '%' in the value was escaped at both layers (%2525), so '%' only
    * ever introduces an escape. __HIVE_DEFAULT_PARTITION__ maps to null.
    */
  private def injectPartitionCol(df: DataFrame, pc: String,
                                 pcType: String): DataFrame = {
    def pctDecode(c: Column): Column =
      url_decode(regexp_replace(c, "\\+", "%2B"))
    val raw = regexp_extract(input_file_name(),
      java.util.regex.Pattern.quote(pc) + "=([^/]+)/", 1)
    df.withColumn(pc,
      when(raw === lit(NullPartitionName), lit(null).cast("string"))
        .otherwise(pctDecode(pctDecode(raw)))
        .cast(pcType))
  }

  /** Manifest-side partition pruning: read only the directories whose
    * partition value satisfies `keep` — the scan never opens the rest.
    */
  def readPruned(spark: SparkSession, table: String,
                 keep: String => Boolean): DataFrame = {
    val v = latestVersion(table).getOrElse(
      throw new IllegalArgumentException(s"$table has no committed snapshot"))
    val m = readManifest(table, v)
    require(m.partitionCol.nonEmpty, s"$table is not partitioned")
    val kept = m.dirs.filter(d => keep(partitionValueOf(d)))
    if (kept.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        read(spark, table, Some(v)).schema)
    else injectPartitionCol(spark.read.schema(m.dataSchema).parquet(kept: _*),
      m.partitionCol, m.partitionType)
  }

  /** The UNESCAPED partition value a directory holds (null for the
    * null-partition directory) — the form incoming values compare
    * against and `readPruned`'s keep() receives.
    */
  private def partitionValueOf(dir: String): String =
    unescapeValue(dir.substring(dir.lastIndexOf('=') + 1))

  /** Atomic partition-scoped MERGE: keep-latest upsert of `incoming`
    * into the touched partitions only; untouched directories carry over
    * into the new manifest by reference. A crash at ANY point leaves the
    * previous snapshot fully live.
    *
    * Schema evolution (Delta mergeSchema semantics): columns new in
    * `incoming` append to the table schema; columns absent from
    * `incoming` null-fill for its rows. Untouched directories are NOT
    * rewritten — the evolved schema in the manifest null-fills their
    * missing columns at read time.
    */
  def merge(incoming: DataFrame, table: String, keys: Seq[String],
            versionCol: String, partitionCol: String): Long = {
    latestVersion(table) match {
      case None => commit(incoming, table, Some(partitionCol))
      case Some(v) =>
        val m = readManifest(table, v)
        require(m.partitionCol == partitionCol,
          s"partition mismatch: table has '${m.partitionCol}', merge got '$partitionCol'")
        val incomingData = StructType(
          incoming.schema.filterNot(_.name == partitionCol))
        val evolved = StructType(m.dataSchema.fields ++
          incomingData.fields.filterNot(f => m.dataSchema.fieldNames.contains(f.name)))
        val targetFull = StructType(evolved.fields :+
          incoming.schema(partitionCol))
        val incomingR = Pipeline.reconcileSchema(incoming, targetFull)
        val touched = incoming.select(col(partitionCol).cast("string"))
          .distinct().collect().map(_.getString(0)).toSet
        val (touchedDirs, untouchedDirs) =
          m.dirs.partition(d => touched.contains(partitionValueOf(d)))
        val merged =
          if (touchedDirs.isEmpty) incomingR
          else {
            val spark = incoming.sparkSession
            val existing = injectPartitionCol(
              spark.read.schema(m.dataSchema).parquet(touchedDirs: _*),
              partitionCol, m.partitionType)
            Merge.upsert(Pipeline.reconcileSchema(existing, targetFull),
              incomingR, keys, versionCol)
          }
        val newDirs = writeData(merged, table, Some(partitionCol))
        writeManifest(table, Manifest(v + 1, partitionCol, m.partitionType,
          evolved.json, (untouchedDirs ++ newDirs).sorted))
        v + 1
    }
  }

  /** K5 compaction as a SNAPSHOT COMMIT: rewrite the current snapshot's
    * data small-file-free and publish it as the next version — fully
    * atomic (readers see either the fragmented or the compacted
    * snapshot, never a mix), and the pre-compaction version stays
    * readable until `vacuum`. Partitioned tables compact to ONE file
    * per partition directory (clustered by the partition column);
    * unpartitioned tables coalesce to `targetFiles`. This is the
    * reference's per-run VACUUM (downloader_tw.py:126, main.py:192)
    * with transactional semantics.
    */
  def compact(spark: SparkSession, table: String,
              targetFiles: Int = 1): Long = {
    val v = latestVersion(table).getOrElse(
      throw new IllegalArgumentException(s"$table has no committed snapshot"))
    val m = readManifest(table, v)
    val df = read(spark, table, Some(v))
    val compacted =
      if (m.partitionCol.isEmpty) df.coalesce(targetFiles)
      else df.repartition(col(m.partitionCol)) // one shuffle → one file per partition dir
    val newDirs = writeData(compacted, table,
      Option(m.partitionCol).filter(_.nonEmpty))
    writeManifest(table, Manifest(v + 1, m.partitionCol, m.partitionType,
      m.dataSchemaJson, newDirs))
    v + 1
  }

  /** Drop data directories no longer referenced by the newest
    * `keepVersions` manifests (and the superseded manifests themselves) —
    * the retention/VACUUM face of the format.
    *
    * Also reclaims ORPHAN commit directories under `table/data/` that no
    * manifest references at all — the residue of crashed writers and of
    * losers of a ConcurrentCommitException race, which would otherwise
    * accumulate unboundedly under retries. Orphans younger than
    * `orphanAgeMs` are left alone so vacuum never races an in-flight
    * commit that has written data but not yet published its manifest.
    */
  def vacuum(table: String, keepVersions: Int = 1,
             orphanAgeMs: Long = 3600000L): Unit = {
    def rm(p: Path): Unit = {
      if (Files.isDirectory(p)) listDir(p).foreach(rm)
      Files.deleteIfExists(p)
    }
    val vs = versions(table)
    val (drop, keep) = vs.splitAt(math.max(0, vs.size - keepVersions))
    val live = keep.flatMap(readManifest(table, _).dirs).toSet
    val dead = drop.flatMap(readManifest(table, _).dirs).toSet -- live
    dead.foreach(d => rm(Paths.get(d)))
    drop.foreach(v => Files.deleteIfExists(manifestPath(table, v)))
    // orphan sweep: a commit dir is live iff some retained manifest
    // references it (partitioned dirs are data/<uuid>/<pc>=<v>;
    // unpartitioned, data/<uuid> itself)
    val dataRoot = Paths.get(table, "data")
    if (Files.isDirectory(dataRoot)) {
      val liveCommits = live.map { d =>
        val p = Paths.get(d)
        if (p.getFileName.toString.contains("=")) p.getParent else p
      }.map(_.toAbsolutePath.normalize)
      val cutoff = System.currentTimeMillis() - orphanAgeMs
      listDir(dataRoot)
        .filterNot(p => liveCommits.contains(p.toAbsolutePath.normalize))
        .filter(p => Files.getLastModifiedTime(p).toMillis < cutoff)
        .foreach(rm)
    }
  }
}
