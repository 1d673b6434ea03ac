package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-n-gram language identification (Cavnar & Trenkle '94
  * shape): score each language by how many of the text's character
  * trigrams appear in a small per-language profile of high-frequency
  * trigrams (built from function words / orthographic patterns), pick
  * the argmax. Pure function + native Catalyst expression — no UDF, no
  * model file, deterministic.
  *
  * Profiles are intentionally tiny (top distinguishing trigrams only):
  * this is the heuristic tier a 100 TB pre-filter wants — cheap,
  * per-row, codegen-adjacent — with a real model as a downstream stage
  * for the ambiguous slice.
  */
object LangId {

  /** Distinctive character trigrams per language (space-padded word
    * boundaries encoded as '_').
    */
  val profiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "he_", "_th", "and", "nd_", "ing", "ng_", "_of", "of_", "_to",
      "to_", "ion", "_in", "in_", "tio", "er_", "_an", "ed_", "is_", "_wi"),
    "es" -> Set("_de", "de_", "os_", "_la", "la_", "el_", "_el", "que", "ue_", "_qu",
      "ión", "ció", "as_", "es_", "_es", "ent", "_en", "ar_", "una", "_un"),
    "de" -> Set("er_", "en_", "ch_", "_de", "der", "ie_", "die", "_di", "und", "nd_",
      "_un", "sch", "ein", "ich", "cht", "ung", "ng_", "das", "_da", "ber"),
    "fr" -> Set("es_", "_de", "de_", "le_", "_le", "ent", "nt_", "la_", "_la", "et_",
      "_et", "les", "our", "que", "ue_", "_qu", "ion", "un_", "une", "ais"),
    "zh" -> Set("的", "是", "在", "了", "我", "有", "和", "就", "不", "人",
      "这", "中", "大", "为", "上", "个", "国", "地", "到", "以"))

  /** Character trigrams of lowercased text with '_' word boundaries. */
  def charTrigrams(text: String): Seq[String] = {
    val norm = "_" + text.toLowerCase.trim.replaceAll("\\s+", "_") + "_"
    if (norm.length < 3) Seq(norm)
    else (0 to norm.length - 3).map(i => norm.substring(i, i + 3))
  }

  /** (language, score) for all languages; score = matched trigram count
    * normalized by trigram total.
    */
  def scores(text: String): Map[String, Double] = {
    val grams = charTrigrams(text)
    if (grams.isEmpty) return profiles.keys.map(_ -> 0.0).toMap
    // CJK shortcut: single chars are the signal, trigram windows still hit
    val gramSet = grams.toSet
    profiles.map { case (lang, prof) =>
      val hits =
        if (lang == "zh") text.count(c => prof.contains(c.toString))
        else grams.count(prof.contains)
      lang -> hits.toDouble / grams.size
    }
  }

  /** Best language, or "und" (undetermined) when nothing scores. */
  def detect(text: String): String = {
    if (text == null || text.trim.isEmpty) return "und"
    val s = scores(text)
    val (lang, score) = s.maxBy { case (l, v) => (v, l) }
    if (score <= 0.0) "und" else lang
  }
}

/** Column form of [[LangId.detect]]. */
final case class LangIdExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(LangId.detect(input.asInstanceOf[UTF8String].toString))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LangIdFunctions {
  def lang_id(c: Column): Column = ColumnBridge.column(LangIdExpr(ColumnBridge.expression(c)))
}
