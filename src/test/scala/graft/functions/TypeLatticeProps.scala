package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the type lattice (SURVEY.md §5.3): the unify
  * fold must behave like a join on a semilattice regardless of
  * observation order.
  */
object TypeLatticeProps extends Properties("TypeLattice") {

  private val tag = Gen.oneOf(
    TypeInference.TAny, TypeInference.TInteger, TypeInference.TFloat,
    TypeInference.TDate, TypeInference.TDatetime, TypeInference.TBoolean,
    TypeInference.TString)
  private val tagSet = Gen.containerOf[Set, String](tag)

  property("order-independent (set semantics)") = forAll(tagSet) { s =>
    TypeInference.unifyTypeSet(s) == TypeInference.unifyTypeSet(s.toList.reverse.toSet)
  }

  property("idempotent: unify(s + unify(s)) == unify(s)") = forAll(tagSet) { s =>
    val u = TypeInference.unifyTypeSet(s)
    TypeInference.unifyTypeSet(s + u) == u
  }

  property("string absorbs") = forAll(tagSet) { s =>
    TypeInference.unifyTypeSet(s + TypeInference.TString) == TypeInference.TString
  }

  property("any is identity") = forAll(tagSet) { s =>
    TypeInference.unifyTypeSet(s + TypeInference.TAny) == TypeInference.unifyTypeSet(s)
  }

  property("result is a defined tag") = forAll(tagSet) { s =>
    Set(TypeInference.TInteger, TypeInference.TFloat, TypeInference.TDate,
      TypeInference.TDatetime, TypeInference.TBoolean, TypeInference.TString)
      .contains(TypeInference.unifyTypeSet(s))
  }

  property("singleton non-any maps to itself") = forAll(tag) { t =>
    t == TypeInference.TAny ||
      TypeInference.unifyTypeSet(Set(t)) == t
  }

  private val cell = Gen.oneOf(
    Gen.numStr, Gen.alphaStr, Gen.const(""), Gen.const("true"),
    Gen.const("2020-01-02"), Gen.const("-7"), Gen.const("1.5"))

  property("runtime classifier total and closed over arbitrary strings") =
    forAll(Gen.oneOf(cell, Gen.asciiPrintableStr)) { s =>
      val t = InferTypeRuntime.infer(org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString
      Set("any", "integer", "float", "date", "datetime", "boolean", "string").contains(t)
    }
}
