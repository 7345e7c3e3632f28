package graft.functions

import com.fasterxml.jackson.core.{JsonFactory, JsonToken}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Every object key of a JSON document as its dotted path, AT EVERY
  * nesting depth, repeats kept — `{"a":{"k":1,"k":2},"b":[{"k":3}]}` →
  * `["a", "a.k", "a.k", "b", "b[0].k"]`. A repeated path therefore means a
  * duplicate key within ONE object scope (array elements are
  * index-disambiguated), which is exactly what the reference's
  * `object_pairs_hook` rejects at every depth
  * (`check_stac_metadata/utils.py:297-314`) while `json.load` — like any
  * JSON-path extractor — silently keeps one of the pair. NULL for
  * malformed or non-object input (the parse check's concern, not this
  * rule's). One streaming Jackson pass, no DOM.
  */
case class JsonKeyPaths(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"json_key_paths needs a string input, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "json_key_paths"

  override def nullSafeEval(input: Any): Any =
    JsonKeyPathsKernel.keyPaths(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.JsonKeyPathsKernel.keyPaths($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): JsonKeyPaths =
    copy(child = newChild)
}

object JsonKeyPathsKernel {
  private val factory = new JsonFactory()

  // path metacharacters inside a KEY are escaped so a literal "a.b" key
  // can never collide with the path of b nested under a (a false
  // duplicate would reject a valid document)
  private def esc(name: String): String =
    if (name.indexOf('.') < 0 && name.indexOf('[') < 0 && name.indexOf('\\') < 0) name
    else name.replace("\\", "\\\\").replace(".", "\\.").replace("[", "\\[")

  def keyPaths(s: UTF8String): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    try {
      val p = factory.createParser(s.toString)
      try {
        if (p.nextToken() != JsonToken.START_OBJECT) return null // non-object: vacuous
        // one frame per open container: is it an array, its next element
        // index, and the dotted path PREFIX for children of that container
        var frames = List((false, 0, ""))
        var pendingField: String = null
        while (frames.nonEmpty) {
          val t = p.nextToken()
          if (t == null) return null // truncated: malformed
          val (isArray, idx, prefix) = frames.head
          t match {
            case JsonToken.FIELD_NAME =>
              pendingField = p.currentName()
              out += UTF8String.fromString(prefix + esc(pendingField))
            case JsonToken.START_OBJECT | JsonToken.START_ARRAY =>
              // the segment naming THIS container, from the frame it sits in
              val seg = if (isArray) {
                frames = (isArray, idx + 1, prefix) :: frames.tail
                s"${prefix.stripSuffix(".")}[$idx]."
              } else prefix + esc(pendingField) + "."
              frames = (t == JsonToken.START_ARRAY, 0, seg) :: frames
            case JsonToken.END_OBJECT | JsonToken.END_ARRAY =>
              frames = frames.tail
            case _ => // scalar value
              if (isArray) frames = (isArray, idx + 1, prefix) :: frames.tail
          }
        }
        // trailing garbage after the root object is malformed input
        if (p.nextToken() != null) return null
      } finally p.close()
    } catch { case _: java.io.IOException => return null } // JsonParseException included
    new GenericArrayData(out.toArray)
  }
}
