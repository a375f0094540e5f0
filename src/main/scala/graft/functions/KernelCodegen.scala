package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}

/** Whole-stage-codegen bridge for kernel expressions (guide §4 / the r15
  * CosineSim lesson generalized).
  *
  * `CodegenFallback` does not merely interpret one node:
  * `CollapseCodegenStages.supportCodegen` excludes ANY operator whose
  * expression tree contains a non-leaf fallback from whole-stage
  * codegen, so the scan/filter/project/partial-agg stage AROUND the
  * kernel is split at operator boundaries and every surrounding
  * expression runs un-fused with an extra row materialization per
  * operator. For the repo's kernel expressions (minhash/shingle
  * featurize, Bloom probes, PQ codecs, edit-distance DPs) the kernel
  * itself is a tight compiled loop either way — the fallback tax was
  * the stage split, not the kernel.
  *
  * These traits emit a `doGenCode` that calls the expression's own
  * `nullSafeEval` kernel through a plan reference object — the SAME
  * compiled method the interpreted path runs, so results are
  * bit-identical by construction — while the node itself stops being a
  * `CodegenFallback` and the stage fuses again. Null semantics follow
  * `nullSafeCodeGen` (null in → null out, children evaluated by the
  * fused stage exactly once); a kernel returning null is honored only
  * when the expression declares `nullable` (a non-nullable expression
  * whose `ev.isNull` is the literal `false` must not be assigned — the
  * ADVICE-r15 CosineSim compile-error trap).
  */
private[graft] object KernelCodegen {
  /** `Object r = <call>; [null-branch] value = (Boxed) r;` — the boxed
    * cast auto-unboxes for primitive `ev.value` targets. */
  def assignFromCall(ctx: CodegenContext, ev: ExprCode,
      dataType: org.apache.spark.sql.types.DataType, nullable: Boolean,
      call: String): String = {
    val r = ctx.freshName("kr")
    val boxed = CodeGenerator.boxedType(dataType)
    if (nullable) {
      s"""
         |Object $r = $call;
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ($boxed) $r;
         |}
       """.stripMargin
    } else {
      // enforce the documented trap (ADVICE r16): a kernel returning
      // null under a non-nullable declaration must fail LOUDLY here —
      // unchecked it would either NPE on primitive unboxing or silently
      // emit a garbage value with isNull = false
      s"""
         |Object $r = $call;
         |if ($r == null) {
         |  throw new IllegalStateException(
         |    "kernel returned null for non-nullable expression");
         |}
         |${ev.value} = ($boxed) $r;
       """.stripMargin
    }
  }
}

/** Mix in INSTEAD OF `CodegenFallback` on a `UnaryExpression` whose
  * kernel lives in `nullSafeEval`. */
trait UnaryKernelCodegen extends UnaryExpression {
  /** Public bridge: generated code cannot call the protected kernel. */
  final def kernel(input: Any): Any = nullSafeEval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("kernelExpr", this,
        classOf[UnaryKernelCodegen].getName)
      KernelCodegen.assignFromCall(ctx, ev, dataType, nullable, s"$ref.kernel($c)")
    })
}

/** Mix in INSTEAD OF `CodegenFallback` on a `BinaryExpression` whose
  * kernel lives in `nullSafeEval`. */
trait BinaryKernelCodegen extends BinaryExpression {
  final def kernel(l: Any, r: Any): Any = nullSafeEval(l, r)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("kernelExpr", this,
        classOf[BinaryKernelCodegen].getName)
      KernelCodegen.assignFromCall(ctx, ev, dataType, nullable, s"$ref.kernel($a, $b)")
    })
}
