package graft

import graft.functions._
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the custom Catalyst expressions.
  *
  * Two entry points:
  *   - cluster-wide: `--conf spark.sql.extensions=graft.GraftExtensions`
  *     injects the functions into every session at startup (the idiomatic
  *     Spark packaging for a library's SQL functions);
  *   - per-session: [[GraftFunctions.register]] for an existing session.
  *
  * Only the expressions whose every argument is a SQL value are exposed —
  * MinHashSig/TopCentroids/HyperplaneSig embed driver-side parameter arrays
  * (hash coefficients, centroids, hyperplanes) and stay DataFrame-only via
  * [[graft.functions.sketches]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // SQL admin statements (SHOW TOPICS / DESCRIBE TOPIC / SHOW CONSUMERS
    // / SHOW SNAPSHOTS) — see GraftSqlParser
    ext.injectParser((_, parser) => new GraftSqlParser(parser))
  }
}

object GraftFunctions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    es => {
      if (es.length != n) throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map("functionName" -> name,
          "expectedNum" -> n.toString, "actualNum" -> es.length.toString,
          "docroot" -> ""))
      build(es)
    }

  /** (name, info, builder) for every SQL-exposable custom expression. */
  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("cosine_sim", info("cosine_sim",
      "cosine_sim(a, b) - cosine similarity of two array<double> (0.0 for zero norms)"),
      arity("cosine_sim", 2)(es => CosineSim(es(0), es(1)))),
    ("jaccard_sim", info("jaccard_sim",
      "jaccard_sim(a, b) - exact Jaccard similarity of two string arrays"),
      arity("jaccard_sim", 2)(es => JaccardSim(es(0), es(1)))),
    ("sorted_jaccard_sim", info("sorted_jaccard_sim",
      "sorted_jaccard_sim(a, b) - Jaccard over pre-sorted distinct string arrays"),
      arity("sorted_jaccard_sim", 2)(es => SortedJaccardSim(es(0), es(1)))),
    ("sorted_jaccard_long_sim", info("sorted_jaccard_long_sim",
      "sorted_jaccard_long_sim(a, b) - Jaccard over pre-sorted distinct array<long>"),
      arity("sorted_jaccard_long_sim", 2)(es => SortedJaccardLongSim(es(0), es(1)))),
    ("simhash64", info("simhash64",
      "simhash64(hashes) - 64-bit SimHash from an array<long> of element hashes"),
      arity("simhash64", 1)(es => SimHash64(es.head))),
    ("nfc_normalize", info("nfc_normalize",
      "nfc_normalize(s) - Unicode canonical composition (NFC) of a string"),
      arity("nfc_normalize", 1)(es => NfcNormalize(es.head))),
    ("strip_accents", info("strip_accents",
      "strip_accents(s) - NFD-decompose and drop combining marks (Mn/Mc/Me)"),
      arity("strip_accents", 1)(es => StripAccents(es.head))))

  /** Register every function into an existing session's registry. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
