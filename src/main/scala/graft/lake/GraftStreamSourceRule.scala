package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.streaming.StreamingRelationV2

/** Analyzer bridge for `spark.readStream.table("cat.db.t")` on graft
  * catalog tables: the analyzer plans a catalog stream as
  * StreamingRelationV2, whose execution requires a DSv2
  * MicroBatchStream the table deliberately does not implement — its
  * streaming read IS the V1 change-feed source every other streaming
  * surface uses (`readStream.format("graft")`,
  * [[graft.streaming.TxLogChangeSourceProvider]]). This rule rewrites
  * the relation to that source during resolution, root taken from the
  * table's durable descriptor and reader options (startingVersion /
  * startingTimestamp / maxVersionsPerTrigger) passed through.
  *
  * The stream therefore has change-feed semantics — rows carry
  * `_change_type` / `_commit_version` like the format("graft") spelling
  * (downstream column references resolve against the rewritten leaf, so
  * selecting them just works). A TIME-TRAVEL-pinned table is not
  * rewritten: streaming a frozen snapshot is a contradiction Spark's own
  * "table does not support streaming" refusal states loudly.
  *
  * Wiring: `spark.sql.extensions=graft.plans.GraftExtensions` — analyzer
  * rules bind at session build, so (unlike the planner strategy) this
  * one has no runtime `register()` path.
  */
class GraftStreamSourceRule(spark: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case s: StreamingRelationV2 =>
        s.table match {
          case t: GraftCatalogTable if !t.isTimeTravelPinned =>
            import scala.jdk.CollectionConverters._
            org.apache.spark.sql.graftnative.v1StreamingRelation(
              spark, "graft",
              s.extraOptions.asCaseSensitiveMap().asScala.toMap +
                ("path" -> t.txRoot))
          case _ => s
        }
    }
}
