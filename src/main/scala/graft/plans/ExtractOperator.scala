package graft.plans

import graft.extract.Processor
import graft.model.{ExtractionRecord, Page}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** The extraction kernel as a first-class Catalyst operator
  * (`LogicalPlan` + `Strategy` + `SparkPlan`, SURVEY.md §4.3 revisited
  * for EXPLAIN-visibility — the (c) tier of the extension ladder, after
  * (a) composition and (b) custom Expressions).
  *
  * Two advantages over the typed `mapPartitions` form:
  *  - `EXPLAIN` shows a named `GraftExtractExec quality=…` node instead
  *    of an opaque `MapPartitions`;
  *  - `references` declares exactly the input columns the kernel reads
  *    (url, warc_ts, html, lang), so Catalyst's column pruning drops
  *    the unused legacy `text` column from the scan — the typed path
  *    must deserialize the whole `Page` including it.
  */
case class GraftExtract(
    child: LogicalPlan, quality: String,
    // Output attrs are a constructor field: `withNewChildInternal` copies
    // must preserve ExprIds or downstream references dangle.
    output: Seq[Attribute] = GraftExtract.outputAttrs()) extends UnaryNode {

  /** Columns the kernel actually reads — drives column pruning. */
  override def references: AttributeSet =
    AttributeSet(child.output.filter(a => GraftExtract.inputCols.contains(a.name)))

  override protected def withNewChildInternal(newChild: LogicalPlan): GraftExtract =
    copy(child = newChild)
}

object GraftExtract {
  val inputCols = Set("url", "warc_ts", "html", "lang")

  private[plans] lazy val encoder = ExpressionEncoder[ExtractionRecord]()

  def outputAttrs(): Seq[Attribute] =
    encoder.schema.fields.toSeq.map(f =>
      AttributeReference(f.name, f.dataType, f.nullable)())
}

case class GraftExtractExec(child: SparkPlan, quality: String, output: Seq[Attribute])
    extends UnaryExecNode {

  // The output attrs originate here (TreeNode would otherwise treat the
  // Seq[Attribute] constructor arg as references → phantom missingInput).
  override def producedAttributes: AttributeSet = AttributeSet(output)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    def idx(name: String): Int = childOutput.indexWhere(_.name == name)
    val (iUrl, iTs, iHtml, iLang) = (idx("url"), idx("warc_ts"), idx("html"), idx("lang"))
    require(iUrl >= 0 && iTs >= 0 && iHtml >= 0 && iLang >= 0,
      s"GraftExtract child must produce url/warc_ts/html/lang, got ${childOutput.map(_.name)}")
    val q = quality
    child.execute().mapPartitions ({ rows =>
      val proc = Processor.default
      val toRow = GraftExtract.encoder.createSerializer()
      rows.map { r =>
        val page = Page(
          url = r.getUTF8String(iUrl).toString,
          warc_ts = if (r.isNullAt(iTs)) null
            else DateTimeUtils.toJavaTimestamp(r.getLong(iTs)),
          html = if (r.isNullAt(iHtml)) null else r.getBinary(iHtml),
          text = "", // unused by the kernel; pruned from the scan
          lang = if (r.isNullAt(iLang)) "" else r.getUTF8String(iLang).toString)
        toRow(proc.extract(page, q)).copy()
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GraftExtractExec =
    copy(child = newChild)
}

object GraftExtractStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GraftExtract(child, quality, _) =>
      GraftExtractExec(planLater(child), quality, plan.output) :: Nil
    case _ => Nil
  }
}

object ExtractOperator {
  /** DataFrame-level entry: install the strategy (idempotent), project
    * down to the kernel's input columns (Catalyst can't prune through an
    * unknown node, so the operator declares its needs as an explicit
    * Project — which then folds into the scan's ReadSchema), and wrap
    * in the operator node.
    */
  def extract(pages: DataFrame, quality: String): DataFrame = {
    val spark = pages.sparkSession
    if (!spark.experimental.extraStrategies.contains(GraftExtractStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GraftExtractStrategy
    val pruned = pages.select("url", "warc_ts", "html", "lang")
    org.apache.spark.sql.graft.GraftSql.ofRows(spark,
      GraftExtract(pruned.queryExecution.analyzed, quality))
  }
}
