package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Structured metadata filter AST + compiler to a Catalyst `Column`
  * (SURVEY.md P4-P8; reference builds `$and/$or/$in/$like/$ilike/$gte/$lte`
  * dicts in loaders/utils/filtering.py:18-123 and query_agent.py:247-271).
  *
  * Compiling to a `Column` (instead of evaluating per-row) means the
  * predicate participates fully in Catalyst: pushed to the parquet scan,
  * pruned, codegen'd — which is the whole point at 100 TB.
  */
sealed trait FilterSpec
object FilterSpec {
  case class Gte(field: String, value: Any)        extends FilterSpec
  case class Lte(field: String, value: Any)        extends FilterSpec
  case class Gt(field: String, value: Any)         extends FilterSpec
  case class Lt(field: String, value: Any)         extends FilterSpec
  case class EqTo(field: String, value: Any)       extends FilterSpec
  case class In(field: String, values: Seq[Any])   extends FilterSpec
  /** Substring match, LIKE-wildcard-escaped first (reference F12+P6). */
  case class Contains(field: String, value: String) extends FilterSpec
  /** Case-insensitive substring match (reference P7 ILIKE). */
  case class IContains(field: String, value: String) extends FilterSpec
  case class IsNotNull(field: String)              extends FilterSpec
  case class And(specs: Seq[FilterSpec])           extends FilterSpec
  case class Or(specs: Seq[FilterSpec])            extends FilterSpec
  case class Not(spec: FilterSpec)                 extends FilterSpec

  /** Compile a spec tree to a single boolean Column. Empty And/Or compile
    * to true/false respectively (conjunction/disjunction identities).
    */
  def compile(spec: FilterSpec): Column = spec match {
    case Gte(f, v)       => col(f) >= lit(v)
    case Lte(f, v)       => col(f) <= lit(v)
    case Gt(f, v)        => col(f) > lit(v)
    case Lt(f, v)        => col(f) < lit(v)
    case EqTo(f, v)      => col(f) === lit(v)
    case In(f, vs)       => col(f).isin(vs: _*)
    case Contains(f, v)  => col(f).contains(v)
    case IContains(f, v) => lower(col(f)).contains(v.toLowerCase)
    case IsNotNull(f)    => col(f).isNotNull
    case And(ss)         => ss.map(compile).foldLeft(lit(true))(_ && _)
    case Or(ss)          => ss.map(compile).foldLeft(lit(false))(_ || _)
    case Not(s)          => !compile(s)
  }
}
