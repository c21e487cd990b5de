package graft

import graft.functions.{CharNgramHashesSorted, CharNgramsDistinct, Float32Dot, LongPosAgreeCount, RollingHash64, SortedLongIntersectCount, StopwordHits, WordShingles, ZOrder64}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions so `spark.sql(...)` users get
  * them too.
  *
  * Usage:
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)
  *     // or: .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, mk) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        mk))
    }
}

object GraftExtensions {

  private def intArg(name: String, e: Expression): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(s"$name: n must be an integer literal, got $other")
  }

  private[graft] val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "float32_dot" -> { children =>
      require(children.size == 2, "float32_dot(a, b) takes exactly 2 arguments")
      Float32Dot(children.head, children(1))
    },
    "char_ngrams_distinct" -> { children =>
      require(children.size == 2, "char_ngrams_distinct(text, n) takes exactly 2 arguments")
      CharNgramsDistinct(children.head, intArg("char_ngrams_distinct", children(1)))
    },
    "word_shingles" -> { children =>
      require(children.size == 2, "word_shingles(text, n) takes exactly 2 arguments")
      WordShingles(children.head, intArg("word_shingles", children(1)))
    },
    "rolling_hash64" -> { children =>
      require(children.size == 1, "rolling_hash64(text) takes exactly 1 argument")
      RollingHash64(children.head)
    },
    "stopword_hits" -> { children =>
      require(children.size >= 2, "stopword_hits(text, word, ...) takes text plus >=1 word literals")
      val words = children.tail.map {
        case Literal(s: org.apache.spark.unsafe.types.UTF8String, org.apache.spark.sql.types.StringType) => s.toString
        case other => throw new IllegalArgumentException(s"stopword_hits: words must be string literals, got $other")
      }
      StopwordHits(children.head, words)
    },
    "char_ngram_hashes_sorted" -> { children =>
      require(children.size == 2, "char_ngram_hashes_sorted(text, n) takes exactly 2 arguments")
      CharNgramHashesSorted(children.head, intArg("char_ngram_hashes_sorted", children(1)))
    },
    "sorted_long_intersect_count" -> { children =>
      require(children.size == 2, "sorted_long_intersect_count(a, b) takes exactly 2 arguments")
      SortedLongIntersectCount(children.head, children(1))
    },
    "long_pos_agree_count" -> { children =>
      require(children.size == 2, "long_pos_agree_count(a, b) takes exactly 2 arguments")
      LongPosAgreeCount(children.head, children(1))
    },
    "zorder64" -> { children =>
      require(children.size == 2, "zorder64(a, b) takes exactly 2 arguments")
      ZOrder64(children.head, children(1))
    })

  /** Register on an already-running session (builder-time extensions
    * are impossible once a session exists, e.g. shared test sessions
    * or notebooks).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, mk) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, mk, "built-in")
    }
}
