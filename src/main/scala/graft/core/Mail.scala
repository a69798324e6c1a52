package graft.core

/** Mail record of the batch exercises
  * (dataset_preparation/MBoxParser.java:41-47): six string fields;
  * `replyTo` is a messageId or the literal string "null"; `time` has
  * format yyyy-MM-dd-HH:mm:ss UTC (MBoxParser.java:137).
  */
case class Mail(
    messageId: String,
    time: String,
    sender: String,
    subject: String,
    body: String,
    replyTo: String)

object Mail {
  /** Record/field delimiters of the delimited mail files
    * (MBoxParser.java:56-57).
    */
  val RecordDelim = "##//##"
  val FieldDelim  = "#|#"
}
