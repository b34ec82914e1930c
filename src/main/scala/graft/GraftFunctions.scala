package graft

import graft.functions.{IsoDurationSecondsExpr, JaccardSimExpr, LshBucketExpr, MinHashSigExpr, SimHash64Expr, VecCosineExpr}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.Bridge

/** SQL surface for graft's custom Catalyst expressions: registers
  * `iso_duration_seconds`, `vec_cosine`, `simhash64`,
  * `minhash_signature`, the `chunk_transcript` table function, and the
  * structured-LLM-output parsers in the session function registry so
  * `spark.sql("SELECT vec_cosine(a, b) ...")` works like any builtin.
  *
  * Two entry points:
  *  - `spark.sql.extensions=graft.GraftExtensions` (spark-submit path);
  *  - `GraftFunctions.register(spark)` (imperative, for an already-built
  *    session).
  */
object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def arity(name: String, args: Seq[Expression], n: Int): Unit =
    if (args.length != n) throw new IllegalArgumentException(
      s"$name expects $n argument(s), got ${args.length}")

  val registry: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "iso_duration_seconds" -> { args =>
      arity("iso_duration_seconds", args, 1); IsoDurationSecondsExpr(args.head) },
    "vec_cosine" -> { args =>
      arity("vec_cosine", args, 2); VecCosineExpr(args(0), args(1)) },
    "simhash64" -> { args =>
      arity("simhash64", args, 1); SimHash64Expr(args.head) },
    // Set-semantics Jaccard over token arrays; a SQL join on
    // `jaccard_sim(a.sh, b.sh) >= t` is re-planned by
    // JaccardPrefixJoinRule exactly like the Column form.
    "jaccard_sim" -> { args =>
      arity("jaccard_sim", args, 2); JaccardSimExpr(args(0), args(1)) },
    // Sign-pattern LSH bucket id (numPlanes literal).
    "lsh_bucket" -> { args =>
      arity("lsh_bucket", args, 2)
      LshBucketExpr(args(0), intLit(args(1), "numPlanes")) },
    // Word n-gram array / one-pass repetition stats (n literal).
    "ngrams" -> { args =>
      arity("ngrams", args, 2)
      graft.functions.NgramsExpr(args(0), intLit(args(1), "n")) },
    "ngram_repetition" -> { args =>
      arity("ngram_repetition", args, 2)
      graft.functions.NgramRepetitionExpr(args(0), intLit(args(1), "n")) },
    "minhash_signature" -> { args =>
      arity("minhash_signature", args, 3)
      MinHashSigExpr(args(0),
        intLit(args(1), "shingleN"), intLit(args(2), "numHashes"))
    },
    // G1 chunker as a SQL table-generating function:
    //   SELECT video_id, c.* FROM t
    //   LATERAL VIEW chunk_transcript(snippets, 1000, 200) c AS text, start
    "chunk_transcript" -> { args =>
      arity("chunk_transcript", args, 3)
      graft.chunk.ChunkTranscriptGen(args(0),
        intLit(args(1), "chunkSize"), intLit(args(2), "chunkOverlap"))
    },
    // Unicode canonical/compatibility normalization (no Spark builtin;
    // multilingual dedup keys break on raw byte equality without it).
    "nfc" -> { args =>
      arity("nfc", args, 1); graft.functions.UnicodeNormExpr(args.head, "NFC") },
    "nfd" -> { args =>
      arity("nfd", args, 1); graft.functions.UnicodeNormExpr(args.head, "NFD") },
    "nfkc" -> { args =>
      arity("nfkc", args, 1); graft.functions.UnicodeNormExpr(args.head, "NFKC") },
    // Structured LLM output (SURVEY §1.3): raw response text -> typed
    // struct, with fence/preamble recovery and malformed -> null.
    "parse_agent_response" -> { args =>
      arity("parse_agent_response", args, 1)
      graft.query.StructuredOutput.parseAgentResponseExpr(args.head)
    },
    "parse_query_response" -> { args =>
      arity("parse_query_response", args, 1)
      graft.query.StructuredOutput.parseQueryResponseExpr(args.head)
    })

  /** Imperative registration into an existing session. */
  def register(spark: SparkSession): Unit =
    registry.foreach { case (name, builder) =>
      Bridge.registerFunction(spark, name, builder)
    }

  /** Imperative optimizer-rule registration for an already-built
    * session (`spark.experimental.extraOptimizations` runs after the
    * main optimizer batches, where the join patterns are visible).
    * Idempotent.
    */
  def registerOptimizations(spark: SparkSession): Unit = {
    val rules = Seq(graft.plans.HammingBandJoinRule, graft.plans.CosineBandJoinRule,
      graft.plans.JaccardPrefixJoinRule, graft.plans.IntervalBinJoinRule)
    val missing = rules.filterNot(spark.experimental.extraOptimizations.contains)
    if (missing.nonEmpty)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations ++ missing
  }
}

/** `spark.sql.extensions` entry point: functions + optimizer rules. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.registry.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.HammingBandJoinRule)
    ext.injectOptimizerRule(_ => graft.plans.CosineBandJoinRule)
    ext.injectOptimizerRule(_ => graft.plans.JaccardPrefixJoinRule)
    ext.injectOptimizerRule(_ => graft.plans.IntervalBinJoinRule)
  }
}
