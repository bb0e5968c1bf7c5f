package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL registration of graft's native expressions, so `spark.sql(...)`
  * users get the same codegen'd functions as the Column API:
  *
  *   minhash_sig(text, k, shingleSize)
  *   shingle_hashes(text, shingleSize)
  *   minhash_from_hashes(hashes, k)
  *   simhash64(text)
  *   dot_f(a, b)
  *   lang_id(text)
  *   text_stats(text)
  *   sorted_intersect_count(a, b)
  *   cdc_cut_starts(text, gramSize, avgChunk)
  *   char_diversity(text)
  *   unicode_normalize(text[, form])
  *
  * Two entry points: [[GraftExtensions]] for
  * `spark.sql.extensions=graft.functions.GraftExtensions` at session
  * build time, and [[GraftFunctions.register]] for an existing session —
  * both feed the same definitions into the function registry.
  */
object GraftFunctions {

  private def intArg(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument $pos must be an integer literal, got $other")
  }

  private val definitions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "minhash_sig" -> {
      case Seq(text, k, n) => MinHashSig(text, intArg(k, "minhash_sig", 2), intArg(n, "minhash_sig", 3))
      case args => throw new IllegalArgumentException(s"minhash_sig expects 3 args, got ${args.length}")
    },
    "shingle_hashes" -> {
      case Seq(text, n) => ShingleHashes(text, intArg(n, "shingle_hashes", 2))
      case args => throw new IllegalArgumentException(s"shingle_hashes expects 2 args, got ${args.length}")
    },
    "minhash_from_hashes" -> {
      case Seq(hashes, k) => MinHashFromHashes(hashes, intArg(k, "minhash_from_hashes", 2))
      case args => throw new IllegalArgumentException(s"minhash_from_hashes expects 2 args, got ${args.length}")
    },
    "simhash64" -> {
      case Seq(text) => SimHash64(text)
      case args => throw new IllegalArgumentException(s"simhash64 expects 1 arg, got ${args.length}")
    },
    "dot_f" -> {
      case Seq(a, b) => DotProductF(a, b)
      case args => throw new IllegalArgumentException(s"dot_f expects 2 args, got ${args.length}")
    },
    "lang_id" -> {
      case Seq(text) => LangIdExpr(text)
      case args => throw new IllegalArgumentException(s"lang_id expects 1 arg, got ${args.length}")
    },
    "text_stats" -> {
      case Seq(text) => TextStatsExpr(text)
      case args => throw new IllegalArgumentException(s"text_stats expects 1 arg, got ${args.length}")
    },
    "sorted_intersect_count" -> {
      case Seq(a, b) => SortedIntersectCount(a, b)
      case args => throw new IllegalArgumentException(s"sorted_intersect_count expects 2 args, got ${args.length}")
    },
    "cdc_cut_starts" -> {
      case Seq(text, g, avg) =>
        CdcCutStarts(text, intArg(g, "cdc_cut_starts", 2), intArg(avg, "cdc_cut_starts", 3))
      case args => throw new IllegalArgumentException(s"cdc_cut_starts expects 3 args, got ${args.length}")
    },
    "char_diversity" -> {
      case Seq(text) => CharDiversityExpr(text)
      case args => throw new IllegalArgumentException(s"char_diversity expects 1 arg, got ${args.length}")
    },
    "unicode_normalize" -> {
      case Seq(text) => UnicodeNormalizeExpr(text, "NFC")
      case Seq(text, Literal(f, _)) if f != null =>
        UnicodeNormalizeExpr(text, String.valueOf(f))
      case Seq(_, second) => throw new IllegalArgumentException(
        "unicode_normalize: the form argument must be a non-null string " +
          s"LITERAL ('NFC'|'NFD'|'NFKC'|'NFKD'), got ${second.sql}")
      case args => throw new IllegalArgumentException(s"unicode_normalize expects 1-2 args, got ${args.length}")
    })

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo("graft.functions", name)

  /** Register into an existing session: SQL functions plus the
    * [[graft.plans.RewriteSortedIntersect]] optimizer rule (via
    * `experimental.extraOptimizations`, the post-session-build seam). */
  def register(spark: SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    definitions.foreach { case (name, builder) =>
      registry.registerFunction(FunctionIdentifier(name), info(name), builder)
    }
    if (!spark.experimental.extraOptimizations.contains(graft.plans.RewriteSortedIntersect))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RewriteSortedIntersect
    if (!spark.experimental.extraOptimizations.contains(graft.plans.RewriteRangeJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RewriteRangeJoin
  }

  private[functions] def inject(ext: SparkSessionExtensions): Unit = {
    definitions.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name), builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.RewriteSortedIntersect)
    ext.injectOptimizerRule(_ => graft.plans.RewriteRangeJoin)
  }
}

/** `spark.sql.extensions` hook: injects the graft SQL functions at
  * session build time. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = GraftFunctions.inject(ext)
}
