package graft.lake

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Expression, PlanExpression, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** A [[FileIndex]] served straight from COMMIT METADATA: the snapshot's
  * live file list with byte sizes recorded at stage time
  * ([[TxLog.FileSizeKey]]) and partition values parsed from the live
  * paths — so planning a scan costs ZERO filesystem calls where the
  * generic `InMemoryFileIndex` stats every path (18 s local at 100k
  * files in the LogBench harness; one round trip PER FILE on an object
  * store). This is the Delta/Iceberg log-served-index shape: the log
  * already knows the files, the scan should never re-discover them.
  *
  * Partition pruning: STATIC partition filters are bound by name against
  * `partSchema` and evaluated here — binding is total because
  * FileSourceStrategy only sends conjuncts referencing partition
  * attributes, and it must be (returning a superset would LEAK rows:
  * partition filters are enforced purely by pruning, never re-applied
  * above the scan). Dynamic conjuncts (subquery/DPP,
  * [[PlanExpression]]s) are skipped — `FileSourceScanExec` re-filters
  * the listed partitions with those itself, so skipping is exact, not
  * conservative. Everything downstream is Spark's own parquet machinery
  * ([[HadoopFsRelation]] + [[ParquetFileFormat]] through
  * `baseRelationToDataFrame`), so vectorized reads, predicate pushdown,
  * and whole-stage codegen are exactly those of a listed scan.
  */
final class GraftFileIndex(
    rootQ: Path,
    partSchema: StructType,
    partitions: Seq[(InternalRow, Array[FileStatus])])
    extends FileIndex {

  override def rootPaths: Seq[Path] = Seq(rootQ)

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression])
      : Seq[PartitionDirectory] = {
    val static = partitionFilters.filterNot(e =>
      e.exists(_.isInstanceOf[PlanExpression[_]]))
    val pruned =
      if (static.isEmpty || partSchema.isEmpty) partitions
      else {
        val bound = static.reduce(And).transform {
          case a: AttributeReference =>
            // fieldIndex throws on an unknown name — LOUD, because a
            // filter this index failed to apply would leak rows
            val i = partSchema.fieldIndex(a.name)
            BoundReference(i, partSchema(i).dataType, nullable = true)
        }
        val pred = Predicate.create(bound)
        pred.initialize(0)
        partitions.filter(p => pred.eval(p._1))
      }
    pruned.map { case (values, files) => PartitionDirectory(values, files) }
  }

  override def inputFiles: Array[String] =
    partitions.iterator.flatMap(_._2).map(_.getPath.toString).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long =
    partitions.iterator.flatMap(_._2).map(_.getLen).sum

  override def partitionSchema: StructType = partSchema
}

object GraftFileIndex {

  /** The metadata-served scan as a DataFrame (public Spark surface:
    * `baseRelationToDataFrame` over a [[HadoopFsRelation]]).
    * `dataSchema` must EXCLUDE the partition columns (their values come
    * from `partitions`' rows, never from file bytes).
    */
  def relation(spark: SparkSession, rootQ: Path,
               partSchema: StructType,
               partitions: Seq[(InternalRow, Array[FileStatus])],
               dataSchema: StructType): DataFrame =
    spark.baseRelationToDataFrame(HadoopFsRelation(
      location = new GraftFileIndex(rootQ, partSchema, partitions),
      partitionSchema = partSchema,
      dataSchema = dataSchema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map.empty)(spark))
}
