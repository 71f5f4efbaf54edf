package graft.io

import graft.core.Cols
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** GTF / GFF3 readers and writers (reference readers.py:243-352
  * `read_gtf`, readers.py:391-449 `read_gff3`, core/out.py:233-315
  * `to_gtf`/`to_gff3`).
  *
  * Both formats: 9 tab-separated columns, 1-based inclusive coordinates
  * (converted to 0-based half-open on read, reference readers.py:273-276),
  * '#' comment lines. They differ only in the attribute grammar:
  * GTF `key "value"; ` (quoted values may contain ';', reference
  * README.md:41-49) vs GFF3 `key=value;`. Attribute parsing is pure
  * built-in expressions (regexp_extract_all / str_to_map) — codegen'd,
  * partition-parallel, no UDF.
  */
object Gtf {
  import Cols._

  val fixedCols: Seq[String] =
    Seq(Chrom, "Source", "Feature", Start, End, "Score", Strand, "Frame")

  private def baseSchema: StructType = StructType(Seq(
    StructField(Chrom, StringType), StructField("Source", StringType),
    StructField("Feature", StringType), StructField("_start1", LongType),
    StructField("_end1", LongType), StructField("Score", StringType),
    StructField(Strand, StringType), StructField("Frame", StringType),
    StructField("Attribute", StringType)))

  private def readRaw(spark: SparkSession, path: String): DataFrame =
    spark.read.option("delimiter", "\t").option("comment", "#")
      .schema(baseSchema).csv(path)
      .withColumn(Start, col("_start1") - 1)
      .withColumn(End, col("_end1"))
      .drop("_start1", "_end1")

  /** GTF attribute string -> map<string,string>. Handles quoted values
    * (';' inside quotes preserved), unquoted numeric values, a final
    * attribute missing its terminating ';' (common in the wild), and
    * repeated keys (e.g. multiple `tag "..."` entries — real
    * Ensembl/GENCODE files carry them; the FIRST occurrence wins, since
    * map_from_entries would otherwise throw DUPLICATED_MAP_KEY under
    * Spark's default dedup policy). */
  def gtfAttrMap(attr: Column): Column = {
    val pairs = regexp_extract_all(attr,
      lit("(\\w+)\\s+(\"[^\"]*\"|[^;]+)(?:;|$)"), lit(0))
    val entries = transform(pairs, p => struct(
      regexp_extract(p, "^(\\w+)\\s+", 1).as("k"),
      regexp_replace(
        regexp_extract(p, "^\\w+\\s+(\"[^\"]*\"|[^;]+)", 1),
        "^\"|\"$", "").as("v")))
    // keep the first entry per key (attrs per line are few — the O(n²)
    // in-row scan is over a ~10-element array, no shuffle, no UDF)
    val deduped = filter(entries, (e, i) =>
      !exists(slice(entries, lit(1), i),
        prev => prev.getField("k") === e.getField("k")))
    map_from_entries(deduped)
  }

  /** GFF3 attribute string -> map (reference readers.py:386 helper). */
  def gff3AttrMap(attr: Column): Column = str_to_map(attr, lit(";"), lit("="))

  /** read_gtf: attributes exploded into one column per requested key
    * (reference explodes all; pass the keys you need — column pruning
    * then skips the rest). */
  def readGtf(spark: SparkSession, path: String,
              attrKeys: Seq[String] = Seq("gene_id", "transcript_id")): DataFrame = {
    val raw = readRaw(spark, path).withColumn("_attrs", gtfAttrMap(col("Attribute")))
    attrKeys.foldLeft(raw)((d, k) => d.withColumn(k, col("_attrs").getItem(k)))
      .drop("_attrs")
      .select((fixedCols ++ attrKeys :+ "Attribute").map(col): _*)
  }

  /** read_gtf_full (reference readers.py:243-352): discover every
    * attribute key present in the file and explode each into its own
    * column — schema inference like Spark's JSON source (one extra
    * pass over the attribute column to collect distinct keys). */
  /** keySampleRows: cap the schema-inference scan to the first N rows
    * (like Spark's JSON samplingRatio) — at 100 TB a full second pass
    * just to learn key names is waste, so the DEFAULT samples 100k rows
    * (annotation files declare their key vocabulary within the first few
    * hundred lines); None = exact full scan, opt-in. Keys the sample
    * misses are still present inside the Attribute map column. */
  def readGtfFull(spark: SparkSession, path: String,
                  keySampleRows: Option[Int] = Some(100000)): DataFrame = {
    val raw = readRaw(spark, path).withColumn("_attrs", gtfAttrMap(col("Attribute")))
    val sampled = keySampleRows.fold(raw)(n => raw.limit(n))
    val keys = sampled.select(explode(map_keys(col("_attrs"))).as("k"))
      .distinct().collect().map(_.getString(0)).sorted.toSeq
    keys.foldLeft(raw)((d, k) => d.withColumn(k, col("_attrs").getItem(k)))
      .drop("_attrs", "Attribute")
      .select((fixedCols ++ keys).map(col): _*)
  }

  def readGff3(spark: SparkSession, path: String,
               attrKeys: Seq[String] = Seq("ID", "Parent")): DataFrame = {
    val raw = readRaw(spark, path)
      .withColumn("_attrs", gff3AttrMap(col("Attribute")))
    attrKeys.foldLeft(raw)((d, k) => d.withColumn(k, col("_attrs").getItem(k)))
      .drop("_attrs")
      .select((fixedCols ++ attrKeys :+ "Attribute").map(col): _*)
  }

  /** to_gtf (reference core/out.py:233-315, gtf_formatter :297): fixed
    * 8 columns (1-based inclusive out) + attributes rebuilt from the
    * given metadata columns as `key "value"; `. */
  def writeGtf(df: DataFrame, path: String, attrCols: Seq[String]): Unit = {
    val attr = concat_ws(" ", attrCols.map(c =>
      when(col(c).isNotNull, concat(lit(c + " \""), col(c).cast("string"), lit("\";")))): _*)
    writeTsv(df, path, attr)
  }

  def writeGff3(df: DataFrame, path: String, attrCols: Seq[String]): Unit = {
    val attr = concat_ws(";", attrCols.map(c =>
      when(col(c).isNotNull, concat(lit(c + "="), col(c).cast("string")))): _*)
    writeTsv(df, path, attr)
  }

  /** Emit the 8 fixed fields + attribute column as RAW tab-joined text.
    * The csv writer is NOT usable here: GTF attributes contain double
    * quotes (`Name "U0";`), which csv quote-escapes into
    * `"Name \"U0\";"` — a symmetric roundtrip through our own reader
    * but an invalid file for every other consumer (the reference emits
    * clean lines, docs/how_to_write.rst:33-39). Still a single-stage
    * projection: one select, one text write, no shuffle. */
  private def writeTsv(df: DataFrame, path: String, attr: Column): Unit =
    // every field coalesced: concat_ws SKIPS null args, so a null
    // coordinate/chromosome would silently DROP its column and shift
    // the 9-field alignment (the old csv writer emitted an empty field)
    df.select(concat_ws("\t",
        coalesce(col(Chrom).cast("string"), lit(".")),
        coalesce(col("Source").cast("string"), lit(".")),
        coalesce(col("Feature").cast("string"), lit(".")),
        coalesce((col(Start) + 1).cast("string"), lit(".")),
        coalesce(col(End).cast("string"), lit(".")),
        coalesce(col("Score").cast("string"), lit(".")),
        coalesce(col(Strand), lit(".")),
        coalesce(col("Frame").cast("string"), lit(".")),
        attr))
      .write.mode("overwrite").text(path)
}
