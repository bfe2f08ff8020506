package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's serving-side string builders, as codegen'd column
  * expressions. */
object PromptFunctions {

  /** Summary prompt — byte-for-byte the reference's
    * `String.format("\"\"\" %s \"\"\" \n\nこちらのドキュメントの中から \"%s\" に関して…")`
    * (PDF-Summarizer/src/main/java/com/yoshio3/SSEOpenAIController.java:151-155). */
  def summaryPrompt(docText: Column, inputText: Column): Column =
    concat(lit("\"\"\" "), docText, lit(" \"\"\" \n\nこちらのドキュメントの中から \""),
      inputText, lit("\" に関して説明している箇所を抜き出してください。"))

  /** Blob deep-link URL with page anchor
    * (SSEOpenAIController.java:199-215). */
  def blobPageUrl(storageAccount: Column, container: Column,
                  fileName: Column, pageNumber: Column): Column =
    concat(lit("https://"), storageAccount, lit(".blob.core.windows.net/"),
      container, lit("/"), fileName, lit("#page="), pageNumber)
}
