package graft

import graft.functions.TextFunctions

/** Chunker vs the reference algorithm
  * (BlobUploadDetector/src/main/java/com/yoshio3/Function.java:214-245). */
class ChunkerSpec extends SparkSpec {

  test("short text → single chunk") {
    assert(TextFunctions.chunkText("hello world.", 100, 30) == Seq("hello world."))
  }

  test("splits at last punctuation in the lookback window, punct starts next chunk") {
    // maxLen 10, lookback 4 → scan indexes 10..7; '.' at index 8
    val t = "aaaaaaaa.bbbbbbbb"
    val chunks = TextFunctions.chunkText(t, 10, 4)
    assert(chunks == Seq("aaaaaaaa", ".bbbbbbbb"))
  }

  test("no punctuation in window → hard split at maxLen - lookback") {
    val t = "a" * 25
    val chunks = TextFunctions.chunkText(t, 10, 4)
    // split length = 10 - 4 = 6 while remainder > 10
    assert(chunks == Seq("a" * 6, "a" * 6, "a" * 6, "a" * 7))
  }

  test("reassembled chunks equal the input") {
    val texts = Seq(
      "The quick brown fox. Jumps over the lazy dog! Again and again? Yes." * 20,
      "nopunctuationatall " * 50,
      "多言語テキスト。句読点で分割します！テストです？はい。" * 40)
    for (t <- texts; maxLen <- Seq(50, 200); lb <- Seq(20, 60)) {
      val chunks = TextFunctions.chunkText(t, maxLen, lb)
      assert(chunks.mkString == t, s"maxLen=$maxLen lb=$lb")
      assert(chunks.init.forall(_.nonEmpty))
    }
  }

  test("all but the last chunk respect maxLen") {
    val t = "word. " * 3000
    val chunks = TextFunctions.chunkText(t, 200, 60)
    assert(chunks.length > 1, "input must actually split")
    assert(chunks.init.forall(_.length <= 200))
  }
}
