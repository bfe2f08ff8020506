package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Summarizer

class SummarizerSpec extends SparkSpec {

  test("KWIC stub: known extraction, truncation, empty on no match") {
    // one hit with full context both sides
    assert(Summarizer.summarizeText("a b c d e spark f g h i j", "spark")
      == "b c d e spark f g h i")
    // two far-apart occurrences → joined with ' ... ' (occurrences closer
    // than the context width are swallowed into one greedy match)
    val two = Summarizer.summarizeText(
      "x spark y " + ("pad " * 10) + "tail spark z", "spark")
    assert(two.contains(" ... "))
    // no occurrence → empty
    assert(Summarizer.summarizeText("nothing here", "spark") == "")
    // truncation to maxLen
    assert(Summarizer.summarizeText(("w " * 20) + "spark " + ("w " * 20),
      "spark", maxLen = 10).length == 10)
    // canonicalization: case-insensitive, whitespace-collapsed
    assert(Summarizer.summarizeText("A  B\nSPARK  C", "spark") == "a b spark c")
  }

  test("batched mapPartitions path == column-expression path") {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      .repartition(3)
    val viaOp = Summarizer.summarize(docs, textCol = "text", query = "spark",
        batchSize = 7)
      .select(col("doc_id"), col("summary"))
    val viaCol = docs.select(col("doc_id"),
      Summarizer.extractiveSummary(col("text"), "spark").as("summary"))
    assert(viaOp.count() == docs.count())
    assert(viaOp.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaOp).isEmpty)
    // the stub must actually fire on the corpus (non-vacuous)
    assert(viaOp.where(length(col("summary")) > 0).count() > 0)
  }

  test("serveEvents: 3 events per hit in reference emission order") {
    import spark.implicits._
    val hits = Seq(
      ("id1", "https://x/f.pdf#page=2", 2L, "f.pdf", "sum one"),
      ("id2", "https://x/g.pdf#page=5", 5L, "g.pdf", "")
    ).toDF("id", "url", "pagenumber", "filename", "summary")
    val ev = Summarizer.serveEvents(hits).orderBy(col("id"), col("ev_seq"))
    assert(ev.count() == 6)
    val rows = ev.select(col("payload")).collect().map(_.getString(0))
    assert(rows(0) == """{"type":"create","id":"id1"}""")
    assert(rows(1) == """{"type":"createLink","id":"id1","link":"https://x/f.pdf#page=2","pageNumber":2,"fileName":"f.pdf"}""")
    assert(rows(2) == """{"type":"addMessage","id":"id1","content":"sum one"}""")
    assert(rows(5) == """{"type":"addMessage","id":"id2","content":""}""")
  }

  test("serveEventsDelta: reference emission order; masked deltas reassemble the summary") {
    import spark.implicits._
    val sum = "alpha beta gamma delta epsilon zeta eta theta" // 45 chars
    val hits = Seq(
      ("id1", "https://x/f.pdf#page=2", 2L, "f.pdf", sum),
      ("id2", "https://x/g.pdf#page=5", 5L, "g.pdf", "") // empty stream
    ).toDF("id", "url", "pagenumber", "filename", "summary")
    val ev = Summarizer.serveEventsDelta(hits, chunkLen = 10)
      .orderBy(col("id"), col("ev_seq"))
    val byId = ev.select(col("id"), col("ev_seq"), col("payload")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.sortBy(_.getLong(1)).map(_.getString(2)))

    val e1 = byId("id1")
    // create, createLink, ceil(45/10)=5 deltas, complete
    assert(e1.length == 2 + 5 + 1, e1.mkString("\n"))
    assert(e1(0) == """{"type":"create","id":"id1"}""")
    assert(e1(1).startsWith("""{"type":"createLink","id":"id1","""))
    val deltaRe = """\{"type":"addMessage","id":"id1","content":"(.*)"\}""".r
    val deltas = e1.slice(2, 7).map { case deltaRe(c) => c }
    // every delta is space-masked; unmasking + concatenating = summary
    assert(deltas.forall(!_.contains(" ")))
    assert(deltas.map(_.replace("<SPECIAL_WHITE_SPACE>", " ")).mkString == sum)
    assert(e1(7) == s"""{"type":"complete","id":"id1","content":"$sum"}""")

    // empty summary: no addMessage deltas, just create/createLink/complete
    val e2 = byId("id2")
    assert(e2.length == 3, e2.mkString("\n"))
    assert(e2(2) == """{"type":"complete","id":"id2","content":""}""")
  }
}
