package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's scalar-function surface, completed.
  *
  * The reference registers only `abs` by name
  * (`logical_plan/expression.rs:96-114`) and implements abs/sin/cos at
  * runtime — with `tan` dispatching to `cos` by a copy-paste bug
  * (`physical_plan/expression/unary.rs:96`). The string functions are
  * enumerated but `todo!()` (`unary.rs:97-106`). Here every one is a thin
  * alias over `org.apache.spark.sql.functions` (all codegen'd); `tan` is
  * tan.
  */
object Functions {
  def absF(c: Column): Column = abs(c)
  def sinF(c: Column): Column = sin(c)
  def cosF(c: Column): Column = cos(c)
  /** Correct tangent — the reference computes cos here (`unary.rs:96`). */
  def tanF(c: Column): Column = tan(c)

  // reference `ScalarFunc` enum `logical_plan/expression.rs:391-422`
  def trimF(c: Column): Column = trim(c)
  def ltrimF(c: Column): Column = ltrim(c)
  def rtrimF(c: Column): Column = rtrim(c)
  def characterLength(c: Column): Column = length(c)
  def lowerF(c: Column): Column = lower(c)
  def upperF(c: Column): Column = upper(c)
  def repeatF(c: Column, n: Int): Column = repeat(c, n)
  def replaceF(c: Column, search: String, repl: String): Column =
    regexp_replace(c, java.util.regex.Pattern.quote(search), repl)
  def reverseF(c: Column): Column = reverse(c)
  def substrF(c: Column, pos: Int, len: Int): Column = substring(c, pos, len)
}
