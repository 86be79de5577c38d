package graft.ast

/** Structural recursion helpers over Expr trees. */
object ExprOps {

  /** Bottom-up transform: children first, then the node itself. */
  def transformUp(e: Expr)(f: Expr => Expr): Expr = {
    def go(x: Expr): Expr = f(mapChildren(x, go))
    go(e)
  }

  def mapChildren(e: Expr, f: Expr => Expr): Expr = e match {
    case Prop(s, k) => Prop(f(s), k)
    case ListLit(items) => ListLit(items.map(f))
    case MapLit(items) => MapLit(items.map { case (k, v) => (k, f(v)) })
    case Ands(es) => Ands(es.map(f))
    case Ors(es) => Ors(es.map(f))
    case Xor(l, r) => Xor(f(l), f(r))
    case Not(x) => Not(f(x))
    case Cmp(op, l, r) => Cmp(op, f(l), f(r))
    case IsNull(x, n) => IsNull(f(x), n)
    case In(l, r) => In(f(l), f(r))
    case StartsWith(l, r) => StartsWith(f(l), f(r))
    case EndsWith(l, r) => EndsWith(f(l), f(r))
    case Contains(l, r) => Contains(f(l), f(r))
    case RegexMatch(l, r) => RegexMatch(f(l), f(r))
    case HasLabels(s, ls) => HasLabels(f(s), ls)
    case Arith(op, l, r) => Arith(op, f(l), f(r))
    case Neg(x) => Neg(f(x))
    case FuncCall(n, args, d) => FuncCall(n, args.map(f), d)
    case CaseExpr(s, alts, d) => CaseExpr(s.map(f),
      alts.map { case (c, v) => (f(c), f(v)) }, d.map(f))
    case Index(s, i) => Index(f(s), f(i))
    case Slice(s, a, b) => Slice(f(s), a.map(f), b.map(f))
    case ListComprehension(v, l, w, p) =>
      ListComprehension(v, f(l), w.map(f), p.map(f))
    case IterablePredicate(k, v, l, w) => IterablePredicate(k, v, f(l), f(w))
    case Reduce(a, i, v, l, s) => Reduce(a, f(i), v, f(l), f(s))
    case MapProjection(v, items) => MapProjection(v, items.map {
      case ProjExpr(k, ex) => ProjExpr(k, f(ex))
      case other => other
    })
    case leaf => leaf
  }

  def exists(e: Expr)(p: Expr => Boolean): Boolean = {
    var found = false
    transformUp(e) { x => if (p(x)) found = true; x }
    found
  }

  def containsPatternPredicate(e: Expr): Boolean =
    exists(e)(_.isInstanceOf[PatternPredicate])

  def containsPatternComp(e: Expr): Boolean =
    exists(e)(_.isInstanceOf[PatternComp])
}
