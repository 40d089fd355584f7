package graft.ingest

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Minimal Apache Iceberg v2 table support, from the PUBLIC table-format
  * spec (https://iceberg.apache.org/spec/) — no Iceberg jars ship in this
  * image (restated every round; `BASELINE.json input_hint` names an Iceberg
  * table of web pages), so the metadata layer is implemented here directly:
  *
  *   version-hint.text → vN.metadata.json (JSON) → snapshot → manifest-list
  *   (Avro) → manifests (Avro) → parquet data files,
  *
  * exactly the resolution chain a real Iceberg reader walks. Everything
  * metadata is DRIVER-side and O(#files) — the data path is an ordinary
  * distributed `spark.read.schema(…).parquet(files…)` scan with the schema
  * taken from table metadata (no inference job), which is precisely how
  * Iceberg's own Spark reader is shaped: plan files on the driver, scan in
  * parallel. Supported read surface:
  *
  *   - snapshot resolution: current, by snapshot-id, or as-of timestamp
  *     (time travel over `snapshots` + `timestamp-ms`)
  *   - manifest-level partition pruning via the `partitions` field summaries
  *     (lower/upper bounds) — at 10^12 docs this is what keeps planning
  *     O(touched-manifests), not O(all-files)
  *   - file-level pruning on identity-partition tuples
  *   - status=DELETED entries skipped; v1-vs-v2 field-name drift tolerated
  *     (`added_files_count` vs `added_data_files_count`, …) by defensive
  *     by-name access
  *
  *   - v2 MERGE-ON-READ row-level deletes (round 5): position deletes
  *     ((file_path, pos) parquet, content=1) applied as an anti-join
  *     against the scan's `_metadata.file_path`/`row_index` lineage, and
  *     equality deletes (content=2, per equality_ids group) applied
  *     null-safe with the spec's sequence-number strictness — a row
  *     re-inserted AFTER an equality delete survives it. Append-only
  *     snapshots keep the plain-scan plan unchanged. `planFiles` (a raw
  *     data-file listing) still refuses delete-carrying snapshots loudly —
  *     its counts would lie; `readTable`/`planScan` are the delete-aware
  *     paths, and malformed tables (delete files inside data manifests or
  *     vice versa) fail loudly at planning.
  *
  * The writer exists to produce spec-shaped fixtures (and is honest
  * Iceberg v2: accumulated manifest list per snapshot, sequence numbers,
  * partition summaries, `field-id` props on every Avro field; `deleteWhere`
  * commits position-delete snapshots, `appendEqualityDeletes` global
  * equality-delete snapshots — data files are never rewritten).
  * Identity partition columns carry a small-cardinality contract (each
  * distinct tuple is one driver-side parquet write — `lang` with 6 values,
  * not `url`); a real high-volume writer distributes that fan-out, but the
  * LAYOUT produced is the same, which is what the reader cares about.
  * When real Iceberg jars are on the classpath, `readTable` is a one-line
  * switch to `spark.read.table` (SURVEY.md §8).
  */
object IcebergLite {

  /** One planned data file: absolute path, identity-partition tuple,
    * footer row count, size in bytes. */
  final case class DataFileInfo(path: String, partition: Map[String, String],
                                recordCount: Long, sizeBytes: Long)

  /** One planned row-level delete file (v2 merge-on-read). `equalityIds`
    * is empty for position deletes (content=1), the equality field ids for
    * equality deletes (content=2). `sequenceNumber` is the entry's data
    * sequence number (inherited from its manifest when null). */
  final case class DeleteFileInfo(path: String, partition: Map[String, String],
                                  recordCount: Long, sequenceNumber: Long,
                                  equalityIds: Seq[Int])

  /** A delete-aware snapshot scan plan. `dataSeq` maps each data file's
    * NORMALIZED path (scheme stripped — see `normPath`) to its data
    * sequence number, the key position/equality delete application needs. */
  final case class ScanPlan(dataFiles: Seq[DataFileInfo],
                            dataSeq: Map[String, Long],
                            posDeletes: Seq[DeleteFileInfo],
                            eqDeletes: Seq[DeleteFileInfo])

  /** Scheme-normalized file path: `file:/x`, `file:///x` and `/x` all
    * compare equal. Delete files reference data files by path STRING; the
    * manifest writer, the parquet `_metadata.file_path` column and the
    * delete-file `file_path` column spell the same file with different
    * scheme syntax, so every comparison in the delete-apply path goes
    * through this normalization (Java regex, same pattern as the
    * `regexp_replace` used on the distributed side). */
  private def normPath(p: String): String =
    p.replaceFirst("^[A-Za-z][A-Za-z0-9+.\\-]*:/+", "/")
  private def normPathCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(c, "^[A-Za-z][A-Za-z0-9+.\\-]*:/+", "/")

  private val mapper = new ObjectMapper()

  private def fs(p: Path, spark: SparkSession): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ------------------------------------------------------------------
  // type mapping (Spark ↔ Iceberg schema JSON)
  // ------------------------------------------------------------------

  private def icebergType(dt: DataType, nextId: () => Int): Object = dt match {
    case LongType      => "long"
    case IntegerType   => "int"
    case DoubleType    => "double"
    case FloatType     => "float"
    case StringType    => "string"
    case BinaryType    => "binary"
    case BooleanType   => "boolean"
    case TimestampType => "timestamptz"
    case DateType      => "date"
    case ArrayType(elem, _) =>
      val inner = icebergType(elem, nextId)
      require(inner.isInstanceOf[String],
        s"IcebergLite: nested list element type $elem unsupported")
      val n = mapper.createObjectNode()
      n.put("type", "list")
      n.put("element-id", nextId())
      n.put("element", inner.asInstanceOf[String])
      n.put("element-required", false)
      n
    case other => throw new IllegalArgumentException(
      s"IcebergLite: unsupported column type $other")
  }

  private def sparkType(t: String): DataType = t match {
    case "long" => LongType
    case "int" => IntegerType
    case "double" => DoubleType
    case "float" => FloatType
    case "string" => StringType
    case "binary" => BinaryType
    case "boolean" => BooleanType
    case "timestamptz" | "timestamp" => TimestampType
    case "date" => DateType
    case other => throw new IllegalArgumentException(
      s"IcebergLite: unsupported metadata type $other")
  }

  /** Spark StructType from the table-metadata Iceberg schema — the read
    * schema comes from METADATA, not parquet inference (one less job, and
    * the empty-table case still has a schema). */
  private def schemaFromMetadata(meta: ObjectNode): StructType = {
    val schemaId = meta.get("current-schema-id").asInt
    val schemas = meta.get("schemas").elements.asScala.toSeq
    val s = schemas.find(_.get("schema-id").asInt == schemaId)
      .getOrElse(throw new IllegalStateException("current-schema-id missing from schemas"))
    StructType(s.get("fields").elements.asScala.toSeq.map { f =>
      val dt = f.get("type") match {
        case t if t.isTextual => sparkType(t.asText)
        case t if t.isObject && t.get("type").asText == "list" =>
          ArrayType(sparkType(t.get("element").asText),
            containsNull = !t.get("element-required").asBoolean(false))
        case t => throw new IllegalArgumentException(s"IcebergLite: unsupported nested type $t")
      }
      StructField(f.get("name").asText, dt, nullable = true)
    })
  }

  // ------------------------------------------------------------------
  // Avro schemas (field names + field-id props per the v2 spec)
  // ------------------------------------------------------------------

  private val fieldSummarySchema =
    """{"type":"record","name":"r508","fields":[
      |{"name":"contains_null","type":"boolean","field-id":509},
      |{"name":"contains_nan","type":["null","boolean"],"default":null,"field-id":518},
      |{"name":"lower_bound","type":["null","bytes"],"default":null,"field-id":510},
      |{"name":"upper_bound","type":["null","bytes"],"default":null,"field-id":511}
      |]}""".stripMargin

  private lazy val manifestListSchema: Schema = new Schema.Parser().parse(
    s"""{"type":"record","name":"manifest_file","fields":[
       |{"name":"manifest_path","type":"string","field-id":500},
       |{"name":"manifest_length","type":"long","field-id":501},
       |{"name":"partition_spec_id","type":"int","field-id":502},
       |{"name":"content","type":"int","field-id":517},
       |{"name":"sequence_number","type":"long","field-id":515},
       |{"name":"min_sequence_number","type":"long","field-id":516},
       |{"name":"added_snapshot_id","type":"long","field-id":503},
       |{"name":"added_files_count","type":"int","field-id":504},
       |{"name":"existing_files_count","type":"int","field-id":505},
       |{"name":"deleted_files_count","type":"int","field-id":506},
       |{"name":"added_rows_count","type":"long","field-id":512},
       |{"name":"existing_rows_count","type":"long","field-id":513},
       |{"name":"deleted_rows_count","type":"long","field-id":514},
       |{"name":"partitions","type":["null",{"type":"array",
       |  "items":$fieldSummarySchema,"element-id":508}],
       |  "default":null,"field-id":507}
       |]}""".stripMargin)

  /** Partition tuple record (r102): identity transforms only; the Avro
    * field type mirrors the source column (string/long/int). Unpartitioned
    * tables get the spec's empty struct. */
  private def partitionRecordSchema(cols: Seq[(String, DataType)]): String = {
    val fields = cols.zipWithIndex.map { case ((n, dt), i) =>
      val t = dt match {
        case StringType => "\"string\""
        case LongType   => "\"long\""
        case IntegerType => "\"int\""
        case other => throw new IllegalArgumentException(
          s"IcebergLite: unsupported partition column type $other")
      }
      s"""{"name":"$n","type":["null",$t],"default":null,"field-id":${1000 + i}}"""
    }
    s"""{"type":"record","name":"r102","fields":[${fields.mkString(",")}]}"""
  }

  private def manifestEntrySchema(cols: Seq[(String, DataType)]): Schema =
    new Schema.Parser().parse(
      s"""{"type":"record","name":"manifest_entry","fields":[
         |{"name":"status","type":"int","field-id":0},
         |{"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
         |{"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
         |{"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
         |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
         |  {"name":"content","type":"int","field-id":134},
         |  {"name":"file_path","type":"string","field-id":100},
         |  {"name":"file_format","type":"string","field-id":101},
         |  {"name":"partition","type":${partitionRecordSchema(cols)},"field-id":102},
         |  {"name":"record_count","type":"long","field-id":103},
         |  {"name":"file_size_in_bytes","type":"long","field-id":104},
         |  {"name":"split_offsets","type":["null",{"type":"array","items":"long",
         |    "element-id":133}],"default":null,"field-id":132},
         |  {"name":"equality_ids","type":["null",{"type":"array","items":"int",
         |    "element-id":136}],"default":null,"field-id":135},
         |  {"name":"sort_order_id","type":["null","int"],"default":null,"field-id":140}
         |]},"field-id":2}
         |]}""".stripMargin)

  // ------------------------------------------------------------------
  // small avro/json helpers
  // ------------------------------------------------------------------

  /** Defensive by-name access with v1/v2 fallback names; Utf8 → String. */
  private def get(rec: GenericRecord, names: String*): Any = {
    val it = names.iterator
    while (it.hasNext) {
      val n = it.next()
      if (rec.getSchema.getField(n) != null) {
        val v = rec.get(n)
        if (v != null) return v
      }
    }
    null
  }
  private def asString(v: Any): String = v match {
    case null => null
    case s => s.toString
  }
  private def asLong(v: Any, dflt: Long = 0L): Long = v match {
    case null => dflt
    case n: java.lang.Number => n.longValue
    case other => other.toString.toLong
  }

  private def readAvro(spark: SparkSession, path: Path): Seq[GenericRecord] = {
    val in = fs(path, spark).open(path)
    try {
      val stream = new DataFileStream[GenericRecord](in, new GenericDatumReader[GenericRecord]())
      try {
        val buf = ArrayBuffer.empty[GenericRecord]
        while (stream.hasNext) buf += stream.next()
        buf.toSeq
      } finally stream.close()
    } finally { try in.close() catch { case _: Throwable => () } }
  }

  private def writeAvro(spark: SparkSession, path: Path, schema: Schema,
                        meta: Seq[(String, String)], recs: Seq[GenericRecord]): Long = {
    val f = fs(path, spark)
    val out = f.create(path, true)
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    meta.foreach { case (k, v) => w.setMeta(k, v) }
    w.create(schema, out)
    try recs.foreach(w.append) finally w.close() // closes `out`
    f.getFileStatus(path).getLen
  }

  private def readText(spark: SparkSession, p: Path): String = {
    val in = fs(p, spark).open(p)
    try new String(in.readAllBytes(), UTF_8) finally in.close()
  }
  private def writeText(spark: SparkSession, p: Path, s: String): Unit = {
    val out = fs(p, spark).create(p, true)
    try out.write(s.getBytes(UTF_8)) finally out.close()
  }

  // ------------------------------------------------------------------
  // metadata resolution
  // ------------------------------------------------------------------

  private def metadataDir(tableDir: String) = new Path(tableDir, "metadata")

  /** Current vN.metadata.json (version-hint.text, with a directory-listing
    * fallback like Iceberg's own HadoopTableOperations). None if the table
    * does not exist yet. */
  private def currentMetadata(spark: SparkSession, tableDir: String): Option[(Int, ObjectNode)] = {
    val md = metadataDir(tableDir)
    val f = fs(md, spark)
    if (!f.exists(md)) return None
    val hint = new Path(md, "version-hint.text")
    val v =
      if (f.exists(hint)) readText(spark, hint).trim.toInt
      else {
        val vs = f.listStatus(md).map(_.getPath.getName)
          .collect { case n if n.matches("v\\d+\\.metadata\\.json") =>
            n.stripPrefix("v").stripSuffix(".metadata.json").toInt }
        if (vs.isEmpty) return None else vs.max
      }
    val node = mapper.readTree(readText(spark, new Path(md, s"v$v.metadata.json")))
      .asInstanceOf[ObjectNode]
    Some((v, node))
  }

  /** All snapshots of the table: (snapshot-id, timestamp-ms), append order. */
  def snapshots(spark: SparkSession, tableDir: String): Seq[(Long, Long)] =
    currentMetadata(spark, tableDir).toSeq.flatMap { case (_, meta) =>
      meta.get("snapshots").elements.asScala.toSeq.map(s =>
        (s.get("snapshot-id").asLong, s.get("timestamp-ms").asLong))
    }

  // ------------------------------------------------------------------
  // read path
  // ------------------------------------------------------------------

  /** Plan the DATA files of one snapshot. Fails loudly when the snapshot
    * carries row-level delete files: a raw data-file listing would
    * overcount deleted rows — use `readTable` (delete-aware) or `planScan`
    * on merge-on-read tables. */
  def planFiles(spark: SparkSession, tableDir: String,
                snapshotId: Option[Long] = None,
                asOfMs: Option[Long] = None,
                partitionFilter: Map[String, String] = Map.empty): Seq[DataFileInfo] = {
    val plan = planScan(spark, tableDir, snapshotId, asOfMs, partitionFilter)
    require(plan.posDeletes.isEmpty && plan.eqDeletes.isEmpty,
      "IcebergLite: this snapshot carries row-level delete files " +
        "(merge-on-read) — planFiles would overcount; use readTable or planScan")
    plan.dataFiles
  }

  /** Plan one snapshot delete-aware (driver-side, like Iceberg's own
    * planning): resolve the snapshot, walk its manifest list with
    * manifest-level bound pruning, then its manifests with file-level
    * partition-tuple pruning; collect data files (content=0 manifests) and
    * position/equality delete files (content=1 manifests) separately.
    * `partitionFilter` is identity equality, col → value-as-string.
    * Delete files prune only when they carry a CONTRADICTING partition
    * tuple — an absent/null tuple value means partition-agnostic scope and
    * the file is kept (pruning deletes is an optimization, never needed
    * for correctness: a pruned delete could only have matched rows the
    * data-side pruning already dropped). */
  def planScan(spark: SparkSession, tableDir: String,
               snapshotId: Option[Long] = None,
               asOfMs: Option[Long] = None,
               partitionFilter: Map[String, String] = Map.empty): ScanPlan = {
    val (_, meta) = currentMetadata(spark, tableDir).getOrElse(
      throw new IllegalArgumentException(s"IcebergLite: no table at $tableDir"))
    val snaps = meta.get("snapshots").elements.asScala.toSeq
    val chosen = (snapshotId, asOfMs) match {
      case (Some(id), _) => snaps.find(_.get("snapshot-id").asLong == id).getOrElse(
        throw new IllegalArgumentException(s"IcebergLite: snapshot $id not found"))
      case (None, Some(ts)) =>
        val ok = snaps.filter(_.get("timestamp-ms").asLong <= ts)
        if (ok.isEmpty) throw new IllegalArgumentException(
          s"IcebergLite: no snapshot at or before $ts")
        ok.maxBy(_.get("timestamp-ms").asLong)
      case (None, None) =>
        val cur = meta.get("current-snapshot-id").asLong
        snaps.find(_.get("snapshot-id").asLong == cur).getOrElse(
          throw new IllegalStateException("current-snapshot-id missing from snapshots"))
    }

    // partition spec fields by spec-id: Seq of (name, sourceType) in order
    val specs: Map[Int, Seq[(String, String)]] =
      meta.get("partition-specs").elements.asScala.map { sp =>
        val sid = sp.get("spec-id").asInt
        val fields = sp.get("fields").elements.asScala.toSeq.map { f =>
          require(f.get("transform").asText == "identity",
            s"IcebergLite: only identity transforms supported, got ${f.get("transform")}")
          val srcId = f.get("source-id").asInt
          val srcType = meta.get("schemas").elements.asScala
            .flatMap(_.get("fields").elements.asScala)
            .find(_.get("id").asInt == srcId).map(_.get("type").asText)
            .getOrElse("string")
          (f.get("name").asText, srcType)
        }
        sid -> fields
      }.toMap

    // a filter key that is NOT a partition-spec field would be silently
    // vacuous (no manifest bounds, no file tuple) and return the FULL
    // table — reject it instead of betraying the caller's intent
    val knownPartitionCols = specs.values.flatten.map(_._1).toSet
    partitionFilter.keys.foreach(k => require(knownPartitionCols.contains(k),
      s"IcebergLite: '$k' is not a partition column of this table " +
        s"(spec fields: ${knownPartitionCols.toSeq.sorted.mkString(", ")})"))

    val manifestList = new Path(chosen.get("manifest-list").asText)
    val out = ArrayBuffer.empty[DataFileInfo]
    val dataSeq = scala.collection.mutable.Map.empty[String, Long]
    val posDel = ArrayBuffer.empty[DeleteFileInfo]
    val eqDel = ArrayBuffer.empty[DeleteFileInfo]
    readAvro(spark, manifestList).foreach { mf =>
      val mContent = asLong(get(mf, "content"), 0L)
      require(mContent == 0L || mContent == 1L,
        s"IcebergLite: unknown manifest content=$mContent")
      val mfSeq = asLong(get(mf, "sequence_number"), 0L)
      val specId = asLong(get(mf, "partition_spec_id"), 0L).toInt
      val specFields = specs.getOrElse(specId, Seq.empty)

      // manifest-level pruning on string identity bounds
      val summaries = get(mf, "partitions") match {
        case null => Seq.empty
        case l: java.util.List[_] => l.asScala.toSeq.map(_.asInstanceOf[GenericRecord])
        case l: java.lang.Iterable[_] => l.asScala.toSeq.map(_.asInstanceOf[GenericRecord])
        case other => throw new IllegalStateException(s"bad partitions field: $other")
      }
      val prunedOut = specFields.zipWithIndex.exists { case ((name, srcType), i) =>
        partitionFilter.get(name) match {
          case Some(v) if srcType == "string" && i < summaries.length =>
            val s = summaries(i)
            def str(field: String): Option[String] = get(s, field) match {
              case null => None
              case b: ByteBuffer =>
                val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr)
                Some(new String(arr, UTF_8))
              case other => Some(other.toString)
            }
            (str("lower_bound"), str("upper_bound")) match {
              case (Some(lo), Some(hi)) => v < lo || v > hi
              case _ => false
            }
          case _ => false
        }
      }
      if (!prunedOut) {
        val mPath = new Path(asString(get(mf, "manifest_path")))
        readAvro(spark, mPath).foreach { e =>
          val status = asLong(get(e, "status"), 1L)
          if (status != 2L) { // 2 = DELETED
            val df = get(e, "data_file").asInstanceOf[GenericRecord]
            val fContent = asLong(get(df, "content"), 0L)
            val seq = asLong(get(e, "sequence_number"), mfSeq)
            val fmt = asString(get(df, "file_format"))
            require(fmt == null || fmt.equalsIgnoreCase("parquet"),
              s"IcebergLite: unsupported file format $fmt")
            val tuple = get(df, "partition") match {
              case null => Map.empty[String, String]
              case p: GenericRecord =>
                p.getSchema.getFields.asScala.map(f =>
                  f.name -> asString(p.get(f.name))).toMap
            }
            val path = asString(get(df, "file_path"))
            if (mContent == 0L) {
              require(fContent == 0L, "IcebergLite: data manifest (content=0) " +
                "lists a delete file — malformed table")
              val keep = partitionFilter.forall { case (k, v) =>
                tuple.get(k).forall(_ == v) // unknown col: cannot prune
              }
              if (keep) {
                out += DataFileInfo(path, tuple,
                  asLong(get(df, "record_count")),
                  asLong(get(df, "file_size_in_bytes")))
                dataSeq(normPath(path)) = seq
              }
            } else {
              require(fContent == 1L || fContent == 2L,
                "IcebergLite: delete manifest (content=1) lists a data file " +
                  "— malformed table")
              // keep on absent/null tuple values (partition-agnostic scope)
              val keep = partitionFilter.forall { case (k, v) =>
                tuple.get(k) match {
                  case Some(x) if x != null => x == v
                  case _ => true
                }
              }
              if (keep) {
                val ids: Seq[Int] = get(df, "equality_ids") match {
                  case null => Seq.empty
                  case l: java.lang.Iterable[_] =>
                    l.asScala.toSeq.map(x => asLong(x).toInt)
                  case other =>
                    throw new IllegalStateException(s"bad equality_ids: $other")
                }
                val info = DeleteFileInfo(path, tuple,
                  asLong(get(df, "record_count")), seq, ids)
                if (fContent == 1L) posDel += info
                else {
                  require(ids.nonEmpty,
                    "IcebergLite: equality delete file without equality_ids")
                  eqDel += info
                }
              }
            }
          }
        }
      }
    }
    ScanPlan(out.toSeq, dataSeq.toMap, posDel.toSeq, eqDel.toSeq)
  }

  /** Read a snapshot as a DataFrame: driver-side planning, distributed
    * parquet scan with the METADATA schema (pushdown/pruning intact).
    * Merge-on-read snapshots apply their v2 row-level deletes exactly:
    * position deletes as a (file, pos) anti-join against the scan's
    * `_metadata.file_path`/`row_index` lineage (applied when the delete's
    * data sequence number >= the data file's), equality deletes as a
    * null-safe anti-join per equality_ids group (strictly newer sequence
    * numbers only, so a row re-inserted AFTER the delete survives).
    * Append-only snapshots keep the plain-scan plan bit-for-bit. */
  def readTable(spark: SparkSession, tableDir: String,
                snapshotId: Option[Long] = None,
                asOfMs: Option[Long] = None,
                partitionFilter: Map[String, String] = Map.empty): DataFrame = {
    val (_, meta) = currentMetadata(spark, tableDir).getOrElse(
      throw new IllegalArgumentException(s"IcebergLite: no table at $tableDir"))
    val schema = schemaFromMetadata(meta)
    val plan = planScan(spark, tableDir, snapshotId, asOfMs, partitionFilter)
    if (plan.dataFiles.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else if (plan.posDeletes.isEmpty && plan.eqDeletes.isEmpty)
      spark.read.schema(schema).parquet(plan.dataFiles.map(_.path): _*)
    else applyDeletes(spark, meta, schema, plan)
      .select(schema.fieldNames.toIndexedSeq.map(col): _*)
  }

  /** Data scan with row lineage: `_ice_path` (normalized file path),
    * `_ice_pos` (ordinal in the file — the spec's position-delete `pos`),
    * `_ice_seq` (the file's data sequence number, broadcast-joined from the
    * driver-side plan, O(#files) rows). The `assert_true` guard fails
    * LOUDLY if a scanned path fails to match its manifest path after
    * normalization — the alternative is silently resurrecting or
    * double-deleting rows. */
  private def lineageScan(spark: SparkSession, schema: StructType,
                          plan: ScanPlan): DataFrame = {
    import spark.implicits._
    val seqDf = broadcast(plan.dataSeq.toSeq.toDF("_ice_path", "_ice_seq"))
    spark.read.schema(schema).parquet(plan.dataFiles.map(_.path): _*)
      .withColumn("_ice_path", normPathCol(col("_metadata.file_path")))
      .withColumn("_ice_pos", col("_metadata.row_index"))
      .join(seqDf, Seq("_ice_path"), "left")
      .filter(coalesce(assert_true(col("_ice_seq").isNotNull,
        lit("IcebergLite: scanned file path not found in manifest plan")),
        lit(true)))
  }

  /** Apply the plan's row-level deletes over the lineage scan; returns the
    * surviving rows WITH the lineage columns (callers project them away).
    * Per the v2 spec: a position delete applies to rows of data files with
    * sequence number <= its own (vacuous with write-once-unique paths, but
    * kept for fidelity); an equality delete applies STRICTLY to older
    * sequence numbers, with null-safe (`<=>`) key comparison. Delete sets
    * are ordinary DataFrames — AQE broadcasts them when small; when a table
    * carries deletes rivaling the data in size, a shuffled anti-join is the
    * right plan anyway. */
  private def applyDeletes(spark: SparkSession, meta: ObjectNode,
                           schema: StructType, plan: ScanPlan): DataFrame = {
    import spark.implicits._
    var cur = lineageScan(spark, schema, plan)
    if (plan.posDeletes.nonEmpty) {
      val seqDf = broadcast(plan.posDeletes
        .map(d => (normPath(d.path), d.sequenceNumber)).toDF("_del_file", "_del_seq"))
      val delSchema = StructType(Seq(StructField("file_path", StringType),
        StructField("pos", LongType)))
      val dels = spark.read.schema(delSchema).parquet(plan.posDeletes.map(_.path): _*)
        .select(normPathCol(col("file_path")).as("_t_path"), col("pos").as("_t_pos"),
          normPathCol(col("_metadata.file_path")).as("_del_file"))
        .join(seqDf, Seq("_del_file"))
      cur = cur.alias("l").join(dels.alias("r"),
        col("l._ice_path") === col("r._t_path") &&
          col("l._ice_pos") === col("r._t_pos") &&
          col("r._del_seq") >= col("l._ice_seq"), "left_anti")
    }
    if (plan.eqDeletes.nonEmpty) {
      val schemaId = meta.get("current-schema-id").asInt
      val idToName: Map[Int, String] = meta.get("schemas").elements.asScala
        .find(_.get("schema-id").asInt == schemaId).get
        .get("fields").elements.asScala
        .map(f => f.get("id").asInt -> f.get("name").asText).toMap
      // group by equality column set (anti-joins commute; sorted for a
      // deterministic plan)
      plan.eqDeletes.groupBy(_.equalityIds).toSeq
        .sortBy(_._1.mkString(",")).foreach { case (ids, files) =>
          val cols = ids.map(id => idToName.getOrElse(id,
            throw new IllegalArgumentException(
              s"IcebergLite: equality_ids field $id not in current schema")))
          val eqSchema = StructType(cols.map(c => schema(c)))
          val seqDf = broadcast(files
            .map(f => (normPath(f.path), f.sequenceNumber)).toDF("_del_file", "_del_seq"))
          val dels = spark.read.schema(eqSchema).parquet(files.map(_.path): _*)
            .withColumn("_del_file", normPathCol(col("_metadata.file_path")))
            .join(seqDf, Seq("_del_file"))
          val cond = cols.map(c => col(s"l.`$c`") <=> col(s"r.`$c`"))
            .reduce(_ && _) && col("r._del_seq") > col("l._ice_seq")
          cur = cur.alias("l").join(dels.alias("r"), cond, "left_anti")
        }
    }
    cur
  }

  // ------------------------------------------------------------------
  // write path (append-only fixture writer)
  // ------------------------------------------------------------------

  /** Append `df` as one new snapshot; returns the new snapshot id.
    * Identity-partitioned by `partitionCols` (small-cardinality contract —
    * see object doc). `nowMs` is injectable so tests produce stable
    * metadata. */
  def append(df: DataFrame, tableDir: String,
             partitionCols: Seq[String] = Seq.empty,
             nowMs: Long = System.currentTimeMillis()): Long = {
    val spark = df.sparkSession
    val md = metadataDir(tableDir)
    val f = fs(md, spark)
    val prior = currentMetadata(spark, tableDir)
    prior.foreach { case (_, m) =>
      // names AND types: a name-only check would let an int32 append land
      // under metadata declaring long, corrupting reads far from the write
      val existing = schemaFromMetadata(m).fields.map(f => (f.name, f.dataType)).toSeq
      val incoming = df.schema.fields.map(f => (f.name, f.dataType)).toSeq
      require(existing == incoming,
        s"IcebergLite: append schema $incoming != table schema $existing")
      val priorSpec = m.get("partition-specs").elements.asScala
        .find(_.get("spec-id").asInt == m.get("default-spec-id").asInt)
        .map(_.get("fields").elements.asScala.map(_.get("name").asText).toSeq)
        .getOrElse(Seq.empty)
      require(priorSpec == partitionCols,
        s"IcebergLite: append partitioning $partitionCols != table spec $priorSpec (spec evolution unsupported)")
    }
    val version = prior.map(_._1).getOrElse(0) + 1
    val snapshotId = prior.map(_._2.get("current-snapshot-id").asLong).getOrElse(0L) + 1
    val seqNum = prior.map(_._2.get("last-sequence-number").asLong).getOrElse(0L) + 1

    val pCols: Seq[(String, DataType)] =
      partitionCols.map(c => c -> df.schema(c).dataType)

    // ---- data files: one parquet write per distinct partition tuple
    // (identity partitioning; files contain FULL rows, as Iceberg's do)
    val dataDir = new Path(tableDir, s"data/snap-$snapshotId")
    val tuples: Seq[Seq[String]] =
      if (pCols.isEmpty) Seq(Seq.empty)
      else df.select(partitionCols.map(col): _*).distinct()
        .collect().map { r =>
          partitionCols.indices.map { i =>
            require(!r.isNullAt(i), s"IcebergLite: null value in partition " +
              s"column ${partitionCols(i)} (null partition tuples unsupported)")
            r.get(i).toString
          }
        }.toSeq
        .sortBy(_.mkString(" "))
    val entrySchema = manifestEntrySchema(pCols)
    val dfSchema = entrySchema.getField("data_file").schema
    val partSchema = dfSchema.getField("partition").schema

    val entries = ArrayBuffer.empty[GenericRecord]
    tuples.foreach { tup =>
      // percent-encode the path SEGMENT only (like Iceberg's own layout);
      // the manifest partition tuple keeps the raw value — readers plan
      // from manifests, never by parsing paths
      def enc(s: String): String =
        java.net.URLEncoder.encode(s, UTF_8).replace("+", "%20")
      val subdir =
        if (tup.isEmpty) dataDir
        else new Path(dataDir, partitionCols.zip(tup)
          .map { case (c, v) => s"${enc(c)}=${enc(v)}" }.mkString("/"))
      val subset = partitionCols.zip(tup).foldLeft(df) { case (d, (c, v)) =>
        d.filter(col(c).cast("string") === v)
      }
      subset.write.mode("overwrite").parquet(subdir.toString)
      val parts = f.globStatus(new Path(subdir, "part-*.parquet")).toSeq
      parts.foreach { st =>
        val rows = parquetRowCount(spark, st.getPath)
        val pRec = new GenericData.Record(partSchema)
        partitionCols.zip(tup).foreach { case (c, v) =>
          val typed: Any = pCols.find(_._1 == c).get._2 match {
            case LongType => java.lang.Long.valueOf(v)
            case IntegerType => java.lang.Integer.valueOf(v)
            case _ => v
          }
          pRec.put(c, typed)
        }
        val dRec = new GenericData.Record(dfSchema)
        dRec.put("content", 0)
        dRec.put("file_path", st.getPath.toUri.toString)
        dRec.put("file_format", "PARQUET")
        dRec.put("partition", pRec)
        dRec.put("record_count", rows)
        dRec.put("file_size_in_bytes", st.getLen)
        val eRec = new GenericData.Record(entrySchema)
        eRec.put("status", 1) // ADDED
        eRec.put("snapshot_id", snapshotId)
        eRec.put("sequence_number", seqNum)
        eRec.put("file_sequence_number", seqNum)
        eRec.put("data_file", dRec)
        entries += eRec
      }
    }

    // ---- schema / spec JSON (shared by metadata.json and manifest meta)
    var lastColId = 0
    val nextId = () => { lastColId += 1; lastColId }
    val schemaNode = {
      val n = mapper.createObjectNode()
      n.put("type", "struct"); n.put("schema-id", 0)
      val arr = n.putArray("fields")
      df.schema.fields.foreach { sf =>
        val fn = arr.addObject()
        fn.put("id", nextId())
        fn.put("name", sf.name)
        fn.put("required", false)
        icebergType(sf.dataType, nextId) match {
          case s: String => fn.put("type", s)
          case o: ObjectNode => fn.set("type", o)
        }
      }
      n
    }
    val fieldIdOf: Map[String, Int] =
      schemaNode.get("fields").elements.asScala.map(f =>
        f.get("name").asText -> f.get("id").asInt).toMap
    val specNode = {
      val n = mapper.createObjectNode()
      n.put("spec-id", 0)
      val arr = n.putArray("fields")
      partitionCols.zipWithIndex.foreach { case (c, i) =>
        val fn = arr.addObject()
        fn.put("name", c); fn.put("transform", "identity")
        fn.put("source-id", fieldIdOf(c)); fn.put("field-id", 1000 + i)
      }
      n
    }

    // ---- manifest file
    val manifestPath = new Path(md, f"manifest-$snapshotId%05d.avro")
    val manifestLen = writeAvro(spark, manifestPath, entrySchema,
      Seq("schema" -> mapper.writeValueAsString(schemaNode),
        "partition-spec" -> mapper.writeValueAsString(specNode.get("fields")),
        "partition-spec-id" -> "0",
        "format-version" -> "2",
        "content" -> "data"),
      entries.toSeq)

    // ---- manifest-list: prior manifests carried over + the new one
    val addedRows = entries.map(e =>
      asLong(get(e.get("data_file").asInstanceOf[GenericRecord], "record_count"))).sum
    val newMf = new GenericData.Record(manifestListSchema)
    newMf.put("manifest_path", manifestPath.toUri.toString)
    newMf.put("manifest_length", manifestLen)
    newMf.put("partition_spec_id", 0)
    newMf.put("content", 0)
    newMf.put("sequence_number", seqNum)
    newMf.put("min_sequence_number", seqNum)
    newMf.put("added_snapshot_id", snapshotId)
    newMf.put("added_files_count", entries.length)
    newMf.put("existing_files_count", 0)
    newMf.put("deleted_files_count", 0)
    newMf.put("added_rows_count", addedRows)
    newMf.put("existing_rows_count", 0L)
    newMf.put("deleted_rows_count", 0L)
    // per-spec-field summaries over this manifest's partition tuples
    // (skipped when the appended snapshot is EMPTY — no tuples to bound;
    // an absent summary means "no pruning possible", which is correct)
    if (pCols.nonEmpty && tuples.nonEmpty) {
      val sumSchema = manifestListSchema.getField("partitions").schema
        .getTypes.asScala.find(_.getType == Schema.Type.ARRAY).get
      val itemSchema = sumSchema.getElementType
      val sums = pCols.indices.map { i =>
        val vals = tuples.map(_(i))
        val r = new GenericData.Record(itemSchema)
        r.put("contains_null", false)
        r.put("lower_bound", ByteBuffer.wrap(vals.min.getBytes(UTF_8)))
        r.put("upper_bound", ByteBuffer.wrap(vals.max.getBytes(UTF_8)))
        r
      }
      newMf.put("partitions", new GenericData.Array(sumSchema, sums.asJava))
    }
    val priorMfs: Seq[GenericRecord] = prior.toSeq.flatMap { case (_, m) =>
      val cur = m.get("current-snapshot-id").asLong
      m.get("snapshots").elements.asScala
        .find(_.get("snapshot-id").asLong == cur)
        .map(s => readAvro(spark, new Path(s.get("manifest-list").asText))
          .map(copyManifestFile))
        .getOrElse(Seq.empty)
    }
    val listPath = new Path(md, f"snap-$snapshotId%05d.avro")
    writeAvro(spark, listPath, manifestListSchema,
      Seq("format-version" -> "2"), priorMfs :+ newMf)

    // ---- vN.metadata.json
    val root = mapper.createObjectNode()
    root.put("format-version", 2)
    root.put("table-uuid", prior.map(_._2.get("table-uuid").asText)
      .getOrElse(deterministicUuid(tableDir)))
    root.put("location", tableDir)
    root.put("last-sequence-number", seqNum)
    root.put("last-updated-ms", nowMs)
    root.put("last-column-id", lastColId)
    root.put("current-schema-id", 0)
    root.putArray("schemas").add(schemaNode)
    root.put("default-spec-id", 0)
    root.putArray("partition-specs").add(specNode)
    root.put("last-partition-id", 1000 + math.max(partitionCols.length - 1, 0))
    root.put("default-sort-order-id", 0)
    val so = root.putArray("sort-orders").addObject()
    so.put("order-id", 0); so.putArray("fields")
    root.putObject("properties").put("write.format.default", "parquet")
    root.put("current-snapshot-id", snapshotId)
    val snapsArr = root.putArray("snapshots")
    prior.foreach(_._2.get("snapshots").elements.asScala.foreach(snapsArr.add))
    val sn = snapsArr.addObject()
    sn.put("sequence-number", seqNum)
    sn.put("snapshot-id", snapshotId)
    sn.put("timestamp-ms", nowMs)
    val summ = sn.putObject("summary")
    summ.put("operation", "append")
    summ.put("added-data-files", entries.length.toString)
    summ.put("added-records", addedRows.toString)
    sn.put("manifest-list", listPath.toUri.toString)
    sn.put("schema-id", 0)
    val slog = root.putArray("snapshot-log")
    prior.foreach(_._2.get("snapshot-log").elements.asScala.foreach(slog.add))
    val sl = slog.addObject()
    sl.put("timestamp-ms", nowMs); sl.put("snapshot-id", snapshotId)

    writeText(spark, new Path(md, s"v$version.metadata.json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root))
    writeText(spark, new Path(md, "version-hint.text"), version.toString)
    snapshotId
  }

  /** Default partition-spec columns (name, table type) of a committed
    * table's metadata. */
  private def defaultSpecCols(meta: ObjectNode, schema: StructType): Seq[(String, DataType)] = {
    val sid = meta.get("default-spec-id").asInt
    meta.get("partition-specs").elements.asScala
      .find(_.get("spec-id").asInt == sid).toSeq
      .flatMap(_.get("fields").elements.asScala)
      .map { f => val n = f.get("name").asText; n -> schema(n).dataType }
  }

  /** Merge-on-read DELETE: commit one POSITION-DELETE snapshot removing the
    * currently visible rows matching `cond` (existing deletes are applied
    * first, so re-deleting is a no-op). Spec-shaped output: one sorted
    * (file_path, pos) parquet per affected partition tuple, referenced by a
    * content=1 manifest appended to the manifest list — data files are
    * never rewritten. The per-tuple write loop carries the same
    * small-cardinality contract as `append`. Returns the new snapshot id. */
  def deleteWhere(spark: SparkSession, tableDir: String,
                  cond: org.apache.spark.sql.Column,
                  nowMs: Long = System.currentTimeMillis()): Long = {
    import spark.implicits._
    val (_, meta) = currentMetadata(spark, tableDir).getOrElse(
      throw new IllegalArgumentException(s"IcebergLite: no table at $tableDir"))
    val schema = schemaFromMetadata(meta)
    val plan = planScan(spark, tableDir)
    val pCols = defaultSpecCols(meta, schema)
    val entrySchema = manifestEntrySchema(pCols)
    val dfSchema = entrySchema.getField("data_file").schema
    val partSchema = dfSchema.getField("partition").schema
    val snapshotId = meta.get("current-snapshot-id").asLong + 1
    val entries = ArrayBuffer.empty[GenericRecord]
    var deletedRows = 0L
    if (plan.dataFiles.nonEmpty) {
      val visible =
        if (plan.posDeletes.isEmpty && plan.eqDeletes.isEmpty)
          lineageScan(spark, schema, plan)
        else applyDeletes(spark, meta, schema, plan)
      val hits = visible.filter(cond).select(col("_ice_path"), col("_ice_pos"))
      val rawByNorm = plan.dataFiles.map(f => normPath(f.path) -> f.path).toMap
      val tuples = plan.dataFiles.map(_.partition).distinct
        .sortBy(_.toSeq.sortBy(_._1).mkString(" "))
      val f = fs(metadataDir(tableDir), spark)
      tuples.zipWithIndex.foreach { case (tup, i) =>
        val norms = plan.dataFiles.filter(_.partition == tup)
          .map(df0 => normPath(df0.path))
        val sub = if (tuples.size == 1) hits
                  else hits.filter(col("_ice_path").isin(norms: _*))
        // rewrite to the path string the data manifests record, and honor
        // the spec's (file_path, pos) sort order within the delete file
        val rawMap = broadcast(norms.map(p => (p, rawByNorm(p)))
          .toDF("_ice_path", "file_path"))
        val subdir = new Path(tableDir, s"data/snap-$snapshotId/deletes-$i")
        sub.join(rawMap, Seq("_ice_path"))
          .select(col("file_path"), col("_ice_pos").as("pos"))
          .coalesce(1).sortWithinPartitions("file_path", "pos")
          .write.mode("overwrite").parquet(subdir.toString)
        f.globStatus(new Path(subdir, "part-*.parquet")).toSeq.foreach { st =>
          val rows = parquetRowCount(spark, st.getPath)
          if (rows > 0) { // an empty delete file is legal but pure noise
            deletedRows += rows
            entries += deleteEntry(entrySchema, dfSchema, partSchema, pCols,
              tup, st.getPath.toUri.toString, st.getLen, rows,
              content = 1, equalityIds = Seq.empty)
          }
        }
      }
    }
    commitDeleteSnapshot(spark, tableDir, meta, entrySchema, entries.toSeq,
      deletedRows, nowMs)
  }

  /** Fixture writer for EQUALITY deletes (v2 content=2): `keys` rows mark
    * every current-or-earlier row whose named columns match (null-safe) as
    * deleted. Scoping follows the v2 rules: when `keys` carries ALL
    * partition columns of the (identity) default spec, one
    * PARTITION-SCOPED delete file is written per distinct partition tuple
    * — tuple stamped on the manifest entry so partition-filtered reads
    * prune it, and correctness never depends on that pruning because the
    * partition values are equality columns too; otherwise one
    * partition-AGNOSTIC file with a null tuple, this single-spec format's
    * stand-in for a real global delete against an unpartitioned spec.
    * Names AND types must match the table schema. The per-tuple write loop
    * carries the same small-cardinality contract as `append`. Returns the
    * new snapshot id. */
  def appendEqualityDeletes(spark: SparkSession, tableDir: String,
                            keys: DataFrame,
                            nowMs: Long = System.currentTimeMillis()): Long = {
    val (_, meta) = currentMetadata(spark, tableDir).getOrElse(
      throw new IllegalArgumentException(s"IcebergLite: no table at $tableDir"))
    val schema = schemaFromMetadata(meta)
    val pCols = defaultSpecCols(meta, schema)
    keys.schema.fields.foreach { kf =>
      val tf = schema.fields.find(_.name == kf.name).getOrElse(
        throw new IllegalArgumentException(
          s"IcebergLite: equality-delete column ${kf.name} is not a table column"))
      require(tf.dataType == kf.dataType, s"IcebergLite: equality-delete " +
        s"column ${kf.name} type ${kf.dataType} != table ${tf.dataType}")
    }
    val schemaId = meta.get("current-schema-id").asInt
    val fieldIdOf: Map[String, Int] = meta.get("schemas").elements.asScala
      .find(_.get("schema-id").asInt == schemaId).get
      .get("fields").elements.asScala
      .map(f => f.get("name").asText -> f.get("id").asInt).toMap
    val ids = keys.schema.fieldNames.toSeq.map(fieldIdOf)
    val entrySchema = manifestEntrySchema(pCols)
    val dfSchema = entrySchema.getField("data_file").schema
    val partSchema = dfSchema.getField("partition").schema
    val snapshotId = meta.get("current-snapshot-id").asLong + 1
    val f = fs(metadataDir(tableDir), spark)
    val entries = ArrayBuffer.empty[GenericRecord]
    var deletedRows = 0L
    def writeDeleteFiles(df: DataFrame, subdir: Path,
                         tuple: Map[String, String]): Unit = {
      df.coalesce(1).write.mode("overwrite").parquet(subdir.toString)
      f.globStatus(new Path(subdir, "part-*.parquet")).toSeq.foreach { st =>
        val rows = parquetRowCount(spark, st.getPath)
        if (rows > 0) { // an empty delete file is legal but pure noise
          deletedRows += rows
          entries += deleteEntry(entrySchema, dfSchema, partSchema, pCols,
            tuple, st.getPath.toUri.toString, st.getLen, rows,
            content = 2, equalityIds = ids)
        }
      }
    }
    val keyCols = keys.schema.fieldNames.toSet
    if (pCols.nonEmpty && pCols.forall { case (n, _) => keyCols.contains(n) }) {
      // partition-scoped: one delete file per distinct tuple among the keys
      // (null partition value → that field stays unset = agnostic on it)
      val tuples = keys.select(pCols.map(c => col(c._1)): _*).distinct()
        .collect()
        .map(r => pCols.zipWithIndex.collect {
          case ((n, _), i) if !r.isNullAt(i) => n -> r.get(i).toString
        }.toMap)
        .toSeq.sortBy(_.toSeq.sortBy(_._1).mkString(" "))
      tuples.zipWithIndex.foreach { case (tup, i) =>
        val sub = pCols.foldLeft(keys) { case (d, (n, _)) =>
          tup.get(n) match {
            case Some(v) => d.filter(col(n).cast("string") === v)
            case None => d.filter(col(n).isNull)
          }
        }
        writeDeleteFiles(sub,
          new Path(tableDir, s"data/snap-$snapshotId/eq-deletes-$i"), tup)
      }
    } else {
      // partition-agnostic (global): single file, null partition tuple
      writeDeleteFiles(keys,
        new Path(tableDir, s"data/snap-$snapshotId/eq-deletes"), Map.empty)
    }
    commitDeleteSnapshot(spark, tableDir, meta, entrySchema, entries.toSeq,
      deletedRows, nowMs)
  }

  /** One delete-file manifest entry (content 1 = position, 2 = equality). */
  private def deleteEntry(entrySchema: Schema, dfSchema: Schema,
                          partSchema: Schema, pCols: Seq[(String, DataType)],
                          tuple: Map[String, String], path: String,
                          sizeBytes: Long, rows: Long, content: Int,
                          equalityIds: Seq[Int]): GenericRecord = {
    val pRec = new GenericData.Record(partSchema)
    pCols.foreach { case (c, dt) =>
      tuple.get(c).foreach { v =>
        val typed: Any = dt match {
          case LongType => java.lang.Long.valueOf(v)
          case IntegerType => java.lang.Integer.valueOf(v)
          case _ => v
        }
        pRec.put(c, typed)
      }
    }
    val dRec = new GenericData.Record(dfSchema)
    dRec.put("content", content)
    dRec.put("file_path", path)
    dRec.put("file_format", "PARQUET")
    dRec.put("partition", pRec)
    dRec.put("record_count", rows)
    dRec.put("file_size_in_bytes", sizeBytes)
    if (equalityIds.nonEmpty) {
      val arrSchema = dfSchema.getField("equality_ids").schema
        .getTypes.asScala.find(_.getType == Schema.Type.ARRAY).get
      dRec.put("equality_ids", new GenericData.Array(arrSchema,
        equalityIds.map(java.lang.Integer.valueOf).asJava))
    }
    val eRec = new GenericData.Record(entrySchema)
    eRec.put("status", 1) // ADDED
    eRec.put("data_file", dRec)
    eRec // snapshot/sequence numbers stamped at commit
  }

  /** Commit a row-level-delete snapshot: write the content=1 manifest,
    * append it to the prior manifest list, and advance the table metadata
    * (deep-copied — schemas and specs are untouched by deletes). */
  private def commitDeleteSnapshot(spark: SparkSession, tableDir: String,
                                   meta0: ObjectNode, entrySchema: Schema,
                                   entries: Seq[GenericRecord],
                                   deletedRows: Long, nowMs: Long): Long = {
    val md = metadataDir(tableDir)
    val version = currentMetadata(spark, tableDir).get._1 + 1
    val meta = meta0.deepCopy()
    val snapshotId = meta.get("current-snapshot-id").asLong + 1
    val seqNum = meta.get("last-sequence-number").asLong + 1
    entries.foreach { e =>
      e.put("snapshot_id", snapshotId)
      e.put("sequence_number", seqNum)
      e.put("file_sequence_number", seqNum)
    }
    val schemaId = meta.get("current-schema-id").asInt
    val schemaNode = meta.get("schemas").elements.asScala
      .find(_.get("schema-id").asInt == schemaId).get
    val specId = meta.get("default-spec-id").asInt
    val specNode = meta.get("partition-specs").elements.asScala
      .find(_.get("spec-id").asInt == specId).get
    val manifestPath = new Path(md, f"manifest-$snapshotId%05d-deletes.avro")
    val manifestLen = writeAvro(spark, manifestPath, entrySchema,
      Seq("schema" -> mapper.writeValueAsString(schemaNode),
        "partition-spec" -> mapper.writeValueAsString(specNode.get("fields")),
        "partition-spec-id" -> specId.toString,
        "format-version" -> "2",
        "content" -> "deletes"),
      entries)
    val newMf = new GenericData.Record(manifestListSchema)
    newMf.put("manifest_path", manifestPath.toUri.toString)
    newMf.put("manifest_length", manifestLen)
    newMf.put("partition_spec_id", specId)
    newMf.put("content", 1)
    newMf.put("sequence_number", seqNum)
    newMf.put("min_sequence_number", seqNum)
    newMf.put("added_snapshot_id", snapshotId)
    newMf.put("added_files_count", entries.length)
    newMf.put("existing_files_count", 0)
    newMf.put("deleted_files_count", 0)
    newMf.put("added_rows_count", deletedRows)
    newMf.put("existing_rows_count", 0L)
    newMf.put("deleted_rows_count", 0L)
    val cur = meta.get("current-snapshot-id").asLong
    val priorMfs: Seq[GenericRecord] = meta.get("snapshots").elements.asScala
      .find(_.get("snapshot-id").asLong == cur)
      .map(s => readAvro(spark, new Path(s.get("manifest-list").asText))
        .map(copyManifestFile))
      .getOrElse(Seq.empty)
    val listPath = new Path(md, f"snap-$snapshotId%05d.avro")
    writeAvro(spark, listPath, manifestListSchema,
      Seq("format-version" -> "2"), priorMfs :+ newMf)
    meta.put("last-sequence-number", seqNum)
    meta.put("last-updated-ms", nowMs)
    meta.put("current-snapshot-id", snapshotId)
    val sn = meta.withArray[ArrayNode]("snapshots").addObject()
    sn.put("sequence-number", seqNum)
    sn.put("snapshot-id", snapshotId)
    sn.put("timestamp-ms", nowMs)
    val summ = sn.putObject("summary")
    summ.put("operation", "delete")
    summ.put("added-delete-files", entries.length.toString)
    summ.put("added-records", deletedRows.toString)
    sn.put("manifest-list", listPath.toUri.toString)
    sn.put("schema-id", schemaId)
    val sl = meta.withArray[ArrayNode]("snapshot-log").addObject()
    sl.put("timestamp-ms", nowMs)
    sl.put("snapshot-id", snapshotId)
    writeText(spark, new Path(md, s"v$version.metadata.json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(meta))
    writeText(spark, new Path(md, "version-hint.text"), version.toString)
    snapshotId
  }

  /** Rebuild a prior manifest_file entry into OUR schema field-by-field
    * (tolerates v1 names on tables a real writer produced). */
  private def copyManifestFile(r: GenericRecord): GenericRecord = {
    val out = new GenericData.Record(manifestListSchema)
    out.put("manifest_path", asString(get(r, "manifest_path")))
    out.put("manifest_length", asLong(get(r, "manifest_length")))
    out.put("partition_spec_id", asLong(get(r, "partition_spec_id")).toInt)
    out.put("content", asLong(get(r, "content")).toInt)
    out.put("sequence_number", asLong(get(r, "sequence_number")))
    out.put("min_sequence_number", asLong(get(r, "min_sequence_number")))
    out.put("added_snapshot_id", asLong(get(r, "added_snapshot_id")))
    out.put("added_files_count", asLong(get(r, "added_files_count", "added_data_files_count")).toInt)
    out.put("existing_files_count", asLong(get(r, "existing_files_count", "existing_data_files_count")).toInt)
    out.put("deleted_files_count", asLong(get(r, "deleted_files_count", "deleted_data_files_count")).toInt)
    out.put("added_rows_count", asLong(get(r, "added_rows_count")))
    out.put("existing_rows_count", asLong(get(r, "existing_rows_count")))
    out.put("deleted_rows_count", asLong(get(r, "deleted_rows_count")))
    get(r, "partitions") match {
      case null => ()
      case l: java.lang.Iterable[_] =>
        val arrSchema = manifestListSchema.getField("partitions").schema
          .getTypes.asScala.find(_.getType == Schema.Type.ARRAY).get
        val itemSchema = arrSchema.getElementType
        val items = l.asScala.toSeq.map { s0 =>
          val s = s0.asInstanceOf[GenericRecord]
          val n = new GenericData.Record(itemSchema)
          n.put("contains_null", get(s, "contains_null") match {
            case null => false; case b: java.lang.Boolean => b.booleanValue; case _ => false })
          get(s, "contains_nan") match { case null => (); case b => n.put("contains_nan", b) }
          get(s, "lower_bound") match { case null => (); case b => n.put("lower_bound", b) }
          get(s, "upper_bound") match { case null => (); case b => n.put("upper_bound", b) }
          n
        }
        out.put("partitions", new GenericData.Array(arrSchema, items.asJava))
      case _ => ()
    }
    out
  }

  /** Row count from the parquet FOOTER (no scan). */
  private def parquetRowCount(spark: SparkSession, p: Path): Long = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(p, spark.sparkContext.hadoopConfiguration)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getRecordCount finally r.close()
  }

  /** Stable table-uuid (tests rebuild fixtures; metadata stays comparable). */
  private def deterministicUuid(tableDir: String): String =
    java.util.UUID.nameUUIDFromBytes(tableDir.getBytes(UTF_8)).toString
}
