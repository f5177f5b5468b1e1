package graft.curate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Exact phrase search over a POSITIONAL inverted index — the retrieval
  * twin of [[Bm25]]'s bag-of-words index. Mining a corpus for exact
  * multi-word expressions ("chain of thought", a benchmark's question
  * stem, a license boilerplate sentence) is a routine curation op, and a
  * positional index answers it without re-scanning document text.
  *
  * Scale shape: the index is (term, doc_id, pos) — built once (one
  * corpus-sized shuffle on term, exactly what you'd persist as a stored
  * index table at 100 TB). A k-term phrase query touches ONLY the k
  * queried terms' postings (the `term isin phrase` filter prunes at the
  * index scan), then chains k−1 equi-joins on (doc_id, pos − offset) over
  * those term-sized slices; the corpus text never moves. Matching
  * documents are the rows where all k aligned positions exist.
  */
object Phrase {

  /** Positional postings (term, doc_id, pos) — pos is the 0-based
    * whitespace-token index. Persist this frame (or write it as a table)
    * to serve many phrase queries from one corpus pass. */
  def positionalPostings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    // scatter below the tokenizer (r14, guide §2.3): a single-file corpus
    // otherwise posexplodes as ONE task; no-op for already-wide inputs,
    // and a pure projection above — partitioning-invariant
    graft.dedup.Dedup.ensureParallelism(docs)
      .select(col(idCol).as("doc_id"), posexplode(T.tokens(col(textCol))).as(Seq("pos", "term")))

  /** Occurrence counts per document for each phrase: (phrase, doc_id,
    * n_occurrences), only documents with ≥1 occurrence. `postings` is a
    * [[positionalPostings]]-shaped frame (stored or freshly built).
    *
    * Each phrase prunes the index to its own terms before joining, so the
    * join inputs are term-posting-sized, not corpus-sized; the k−1 joins
    * all key on (doc_id, aligned position) and their inputs arrive from
    * the SAME term-pruned scan. Duplicate terms inside a phrase are fine —
    * each slot filters independently. */
  def phraseHits(postings: DataFrame, phrases: Seq[Seq[String]]): DataFrame = {
    require(phrases.nonEmpty && phrases.forall(_.nonEmpty), "phrases must be non-empty")
    phrases.map { phrase =>
      val slots = phrase.zipWithIndex.map { case (w, j) =>
        // align every slot to the phrase START position: slot j at token
        // position p supports a phrase starting at p − j
        postings.filter(col("term") === w)
          .select(col("doc_id"), (col("pos") - j).as("start"))
      }
      slots.reduce { (a, b) => a.join(b, Seq("doc_id", "start")) }
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_occurrences"))
        .select(lit(phrase.mkString(" ")).as("phrase"), col("doc_id"), col("n_occurrences"))
    }.reduce(_.unionAll(_))
  }

  /** One-shot convenience: build the index for exactly the queried terms
    * and search. For repeated querying, build [[positionalPostings]] once
    * and call [[phraseHits]] against it. */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrases: Seq[Seq[String]]): DataFrame = {
    val wanted = phrases.flatten.distinct
    val pruned = positionalPostings(docs, idCol, textCol)
      .filter(col("term").isin(wanted: _*))
    phraseHits(pruned, phrases)
  }
}
