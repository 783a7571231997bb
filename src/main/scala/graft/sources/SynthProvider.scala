package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2: a deterministic synthetic document corpus —
  * `spark.read.format("graft.sources.SynthProvider")` with options
  * `rows`, `partitions`, `seed`. Exists so the dedup/text operators can
  * be exercised at ANY scale without external files: generation is
  * seeded per doc_id (partition-layout independent), splits are planned
  * like a real source (one InputPartition per slice), and column
  * pruning is honored (`SupportsPushDownRequiredColumns`) — ask for
  * `doc_id` only and the text is never materialized.
  *
  * Duplicate structure is planted deterministically: doc_id ≡ 1 (mod 10)
  * repeats the previous doc verbatim (exact dup); doc_id ≡ 2 (mod 10)
  * differs from doc_id−2 in the final token (near dup, bigram jaccard
  * ≈ 0.99) — so dedup results are predictable at every scale.
  */
class SynthProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthProvider.fullSchema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SynthTable(new CaseInsensitiveStringMap(properties))
}

object SynthProvider {
  val fullSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  private val vocab: Array[String] =
    (0 until 200).map(i => s"tok$i").toArray

  /** Deterministic per-doc text, independent of partitioning. */
  def textOf(docId: Long, seed: Long): String = {
    val base = docId % 10 match {
      case 1 => docId - 1 // exact dup of the previous doc
      case 2 => docId - 2 // near dup: same base, last token swapped
      case _ => docId
    }
    val rng = new java.util.Random(seed ^ (base * 0x9E3779B97F4A7C15L))
    val n = 60 + rng.nextInt(60)
    val toks = Array.fill(n)(vocab(rng.nextInt(vocab.length)))
    if (docId % 10 == 2) toks(n - 1) = s"edit$docId"
    toks.mkString(" ")
  }
}

private class SynthTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "graft_synth"
  override def schema(): StructType = SynthProvider.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(
      opts.getLong("rows", 10000L),
      opts.getInt("partitions", 8),
      opts.getLong("seed", 42L))
}

private class SynthScanBuilder(rows: Long, parts: Int, seed: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = SynthProvider.fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new SynthScan(rows, parts, seed, required)
}

private class SynthScan(rows: Long, parts: Int, seed: Long, schema: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    (0 until parts).map { p =>
      val start = rows * p / parts
      val end = rows * (p + 1) / parts
      SynthPartition(start, end, seed): InputPartition
    }.toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(schema)
}

private case class SynthPartition(start: Long, end: Long, seed: Long)
    extends InputPartition

private class SynthReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SynthPartition]
    new PartitionReader[InternalRow] {
      private var id = p.start - 1
      override def next(): Boolean = { id += 1; id < p.end }
      override def get(): InternalRow = {
        // text generated lazily, ONLY if some projected column needs it
        lazy val text = SynthProvider.textOf(id, p.seed)
        val values: Array[Any] = schema.fieldNames.map {
          case "doc_id"  => id
          case "text"    => UTF8String.fromString(text)
          case "lang"    => UTF8String.fromString("en")
          case "source"  => UTF8String.fromString(s"synth${id % 4}")
          case "n_chars" => text.length.toLong
        }.toArray
        InternalRow.fromSeq(values.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
