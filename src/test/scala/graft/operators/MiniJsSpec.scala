package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Interpreter-level semantics for the built-in JavaScript engine. */
class MiniJsSpec extends AnyFunSuite {
  import MiniJs._

  private def run(src: String): V = {
    val e = new Engine()
    e.eval(src)
    e.call("main", Nil)
  }
  private def runS(src: String): String = toStr(run(src))
  private def runN(src: String): Double = toNum(run(src))

  test("literals, arithmetic, precedence, string concat") {
    assert(runN("function main() { return 2 + 3 * 4; }") == 14)
    assert(runN("function main() { return (2 + 3) * 4; }") == 20)
    assert(runS("function main() { return 'a' + 1 + true; }") == "a1true")
    assert(runN("function main() { return 7 % 3; }") == 1)
    assert(runN("function main() { return -2 + +'3'; }") == 1)
  }

  test("var/let/const, if/else, while, for, for-of, break/continue") {
    assert(runN(
      """function main() {
        |  let sum = 0;
        |  for (let i = 0; i < 10; i++) {
        |    if (i % 2 === 0) continue;
        |    if (i > 7) break;
        |    sum += i;
        |  }
        |  const arr = [10, 20, 30];
        |  for (const x of arr) sum += x;
        |  var j = 0;
        |  while (j < 3) { sum = sum + 1; j++; }
        |  return sum;
        |}""".stripMargin) == 1 + 3 + 5 + 7 + 60 + 3)
  }

  test("objects: literals, member/index access and assignment, delete, in, keys") {
    assert(runS(
      """function main() {
        |  const o = { a: 1, "b c": 2, nested: { x: "y" } };
        |  o.d = o.a + o["b c"];
        |  o.nested.x = o.nested.x + "!";
        |  delete o.a;
        |  const has = "a" in o ? "yes" : "no";
        |  return Object.keys(o).join(",") + "|" + o.d + "|" + o.nested.x + "|" + has;
        |}""".stripMargin) == "b c,nested,d|3|y!|no")
  }

  test("arrays: push/filter/map/slice/indexOf/includes/sort/reduce") {
    assert(runS(
      """function main() {
        |  const a = [3, 1, 2];
        |  a.push(4);
        |  const even = a.filter(x => x % 2 === 0).map(x => x * 10);
        |  const sorted = [3,1,2].sort((x, y) => x - y).join("");
        |  const total = a.reduce((acc, x) => acc + x, 0);
        |  return even.join(",") + "|" + sorted + "|" + total + "|" +
        |    a.indexOf(2) + "|" + a.includes(9) + "|" + a.slice(1, 3).join("");
        |}""".stripMargin) == "20,40|123|10|2|false|12")
  }

  test("functions: closures, arrow lexical this, method this-binding, recursion") {
    assert(runN(
      """function counter() {
        |  let n = 0;
        |  return function() { n += 1; return n; };
        |}
        |function fib(n) { return n < 2 ? n : fib(n - 1) + fib(n - 2); }
        |function main() {
        |  const c = counter();
        |  c(); c();
        |  const obj = { v: 40, get: function() { return this.v; } };
        |  const arrowHost = {
        |    v: 100,
        |    mk: function() { return () => this.v; }
        |  };
        |  return c() + obj.get() + arrowHost.mk()() + fib(10);
        |}""".stripMargin) == 3 + 40 + 100 + 55)
  }

  test("JSON: parse + stringify round-trip, integral numbers stay integral") {
    assert(runS(
      """function main() {
        |  const o = JSON.parse('{"id": 1700000000000, "f": 1.5, "s": "x\\ny", "n": null, "arr": [1, 2]}');
        |  o.added = true;
        |  return JSON.stringify(o);
        |}""".stripMargin) ==
      """{"id":1700000000000,"f":1.5,"s":"x\ny","n":null,"arr":[1,2],"added":true}""")
  }

  test("equality: strict vs loose, typeof, truthiness") {
    assert(runS(
      """function main() {
        |  return [1 === 1, "1" === 1, "1" == 1, null == undefined, null === undefined,
        |    typeof "x", typeof 1, typeof undefined, typeof {}, typeof main,
        |    !!"", !!"a", !!0, !!{}].join(",");
        |}""".stripMargin) ==
      "true,false,true,true,false,string,number,undefined,object,function,false,true,false,true")
  }

  test("string methods") {
    assert(runS(
      """function main() {
        |  const s = "Hello World";
        |  return [s.toUpperCase(), s.includes("World"), s.split(" ").length,
        |    s.substring(0, 5), s.indexOf("World"), "  x ".trim(),
        |    s.startsWith("He"), s.slice(-5)].join("|");
        |}""".stripMargin) == "HELLO WORLD|true|2|Hello|6|x|true|World")
  }

  test("template literals: interpolation, nesting, escapes, coercion") {
    assert(runS(
      """function main() {
        |  const name = "world"; const n = 2;
        |  const inner = `n=${n}`;
        |  return `hi ${name}! ${n + 1} ${`<${inner}>`} \n${n === 2 ? "y" : "n"}`;
        |}""".stripMargin) == "hi world! 3 <n=2> \ny")
    assert(runS("function main() { return `${1}${2}${3}`; }") == "123")
    assert(runS("function main() { return `no interp`; }") == "no interp")
  }

  test("try/catch/finally: thrown values bind, engine errors become Error objects") {
    assert(runS(
      """function main() {
        |  let log = [];
        |  try { throw { code: 42, why: "bad" }; }
        |  catch (e) { log.push("caught:" + e.code); }
        |  finally { log.push("fin"); }
        |  try { JSON.parse("{nope"); } catch (e) { log.push("json:" + (e.message !== undefined)); }
        |  try { log.push("ok"); } finally { log.push("fin2"); }
        |  return log.join(",");
        |}""".stripMargin) == "caught:42,fin,json:true,ok,fin2")
    // return/break pass THROUGH finally; uncaught throw surfaces to the host
    assert(runN(
      """function f() { try { return 7; } finally { sideEffect(); } }
        |let n = 0;
        |function sideEffect() { n = n + 1; }
        |function main() { return f() + n; }""".stripMargin) == 8)
    val ex = intercept[JsError](run("""function main() { throw "boom"; }"""))
    assert(ex.getMessage.contains("uncaught") && ex.getMessage.contains("boom"))
  }

  test("step budget is not catchable by script try/catch") {
    val e = new Engine(maxSteps = 50000)
    e.eval("function main() { while (true) { try { let x = 1; } catch (err) {} } }")
    val ex = intercept[JsError](e.call("main", Nil))
    assert(ex.getMessage.contains("step budget"))
  }

  test("number methods: toFixed and toString") {
    assert(runS("function main() { return (1.005).toFixed(2) + '|' + (3).toFixed() + '|' + (12.5).toString(); }")
      .matches("""1\.0[01]\|3\|12\.5""")) // toFixed(2) of 1.005 is locale-stable here
    assert(runS("function main() { return (173665.4667).toFixed(2); }") == "173665.47")
  }

  test("syntax errors and undefined references raise JsError") {
    intercept[JsError](new Engine().eval("function broken( { return 1; }"))
    intercept[JsError](run("function main() { return nope.x; }"))
    intercept[JsError](run("function main() { notAFunction(); }"))
  }

  test("step budget halts runaway loops deterministically") {
    val e = new Engine(maxSteps = 100000)
    e.eval("function main() { while (true) {} }")
    val ex = intercept[JsError](e.call("main", Nil))
    assert(ex.getMessage.contains("step budget"))
  }

  test("recursion cap") {
    val ex = intercept[JsError](run("function main() { return main(); }"))
    assert(ex.getMessage.contains("recursion"))
  }

  test("destructuring: object patterns with renaming, defaults, nesting, rest") {
    assert(runS(
      """function main() {
        |  const ev = {id: 7, type: 'update', source: {db: 'shop', table: 'orders'}, n: 2};
        |  const {id, type: op, missing = 'dflt', source: {db, table}, ...rest} = ev;
        |  return id + '|' + op + '|' + missing + '|' + db + '.' + table + '|' + JSON.stringify(rest);
        |}""".stripMargin) == """7|update|dflt|shop.orders|{"n":2}""")
    // defaults only fill undefined, not null/falsy
    assert(runS(
      """function main() {
        |  const {a = 'x', b = 'y', c = 'z'} = {a: null, b: 0};
        |  return a + '|' + b + '|' + c;
        |}""".stripMargin) == "null|0|z")
  }

  test("destructuring: array patterns, holes via defaults, rest, strings") {
    assert(runS(
      """function main() {
        |  const [first, second = 'B', ...tail] = ['a'];
        |  const [x, y] = 'hi';
        |  return first + '|' + second + '|' + tail.length + '|' + x + y;
        |}""".stripMargin) == "a|B|0|hi")
    assert(runS(
      """function main() {
        |  const pairs = [['k1', 1], ['k2', 2]];
        |  let out = '';
        |  for (const [k, v] of pairs) { out = out + k + '=' + v + ';'; }
        |  return out;
        |}""".stripMargin) == "k1=1;k2=2;")
    intercept[JsError](run("function main() { const {a} = null; return a; }"))
  }

  test("destructuring: function and arrow parameters, rest params") {
    assert(runS(
      """function fmt({id, type = '?'}, [head] = ['none']) {
        |  return id + ':' + type + ':' + head;
        |}
        |function main() { return fmt({id: 1, type: 'c'}, ['x']) + '|' + fmt({id: 2}); }
        |""".stripMargin) == "1:c:x|2:?:none")
    assert(runS(
      """function main() {
        |  const pick = ({type}) => type;
        |  const evs = [{type: 'c'}, {type: 'u'}];
        |  return evs.map(({type}) => type).join(',') + '|' + pick({type: 'd'});
        |}""".stripMargin) == "c,u|d")
    assert(runN(
      """function sum(first, ...rest) {
        |  let s = first;
        |  for (const r of rest) s += r;
        |  return s;
        |}
        |function main() { return sum(1, 2, 3, 4); }
        |""".stripMargin) == 10)
  }

  test("spread: array literals, call arguments, object literals") {
    assert(runS(
      """function main() {
        |  const a = [2, 3];
        |  const b = [1, ...a, 4];
        |  return JSON.stringify(b);
        |}""".stripMargin) == "[1,2,3,4]")
    assert(runN(
      """function add3(x, y, z) { return x + y + z; }
        |function main() { const args = [1, 2, 3]; return add3(...args); }
        |""".stripMargin) == 6)
    assert(runS(
      """function main() {
        |  const base = {a: 1, b: 2};
        |  const over = {...base, b: 9, ...null, c: 3};
        |  return JSON.stringify(over);
        |}""".stripMargin) == """{"a":1,"b":9,"c":3}""")
    // spread copies are shallow and ordered; later keys win (JS semantics)
    assert(runS(
      """function main() {
        |  const o = {b: 0, ...{a: 1, b: 2}};
        |  return JSON.stringify(o);
        |}""".stripMargin) == """{"b":2,"a":1}""")
  }

  test("regex literals: test/exec, match/search/split, lexer disambiguation") {
    assert(runS("function main() { return /\\d+/.test('abc123') + ',' + /\\d+/.test('abc'); }")
      == "true,false")
    assert(runS("function main() { return 'a1b22c'.match(/\\d+/g).join('|'); }") == "1|22")
    assert(runS("function main() { const m = /(\\w+)@(\\w+)/.exec('mail bob@example now'); " +
      "return m[1] + ':' + m[2]; }") == "bob:example")
    assert(runS("function main() { return 'no digits'.match(/\\d/) === null ? 'null' : 'hit'; }")
      == "null")
    assert(runN("function main() { return 'abc def'.search(/\\s/); }") == 3)
    assert(runS("function main() { return 'a1b,c2d;e'.split(/[,;]/).join('|'); }") == "a1b|c2d|e")
    // `/` after a value token is DIVISION, not a regex start
    assert(runN("function main() { const a = 10; const b = 2; return a / b / 1; }") == 5)
    assert(runS("function main() { return /a b/.test('xa by') + ''; }") == "true")
    assert(runS("function main() { return /[/]/.test('a/b') + ''; }") == "true")
    assert(runS("function main() { return /AB/i.test('xaby') + ',' + /AB/.test('xaby'); }")
      == "true,false")
  }

  test("regex replace: string and function replacements, $-references") {
    // the reference's routing preambles lean on String.replace(/re/, ...)
    assert(runS("function main() { return 'a1b2'.replace(/\\d/, 'X'); }") == "aXb2")
    assert(runS("function main() { return 'a1b2'.replace(/\\d/g, 'X'); }") == "aXbX")
    assert(runS("function main() { return 'john smith'.replace(/(\\w+) (\\w+)/, '$2 $1'); }")
      == "smith john")
    assert(runS("function main() { return 'ab'.replace(/b/, '[$&]'); }") == "a[b]")
    assert(runS("function main() { return 'cost: 5$'.replace(/x?/, '$$'); }") == "$cost: 5$")
    assert(runS("function main() { return 'a1b22'.replace(/\\d+/g, " +
      "function(m) { return '<' + m + '>'; }); }") == "a<1>b<22>")
    assert(runS("function main() { return 'k=v'.replace(/(\\w+)=(\\w+)/, " +
      "(m, k, v) => k + ':' + v); }") == "k:v")
    assert(runS("function main() { return 'aXb'.replaceAll(/x/gi, '_'); }") == "a_b")
    // RegExp() constructor form (new-less) and dynamic patterns
    assert(runS("function main() { const r = RegExp('c.t', 'i'); return r.test('CAT') + ''; }")
      == "true")
    assert(runS("function main() { return /x/g.source + '|' + /x/g.flags + '|' + /x/g.global; }")
      == "x|g|true")
  }

  test("new: constructor functions, prototype methods, explicit-return override") {
    assert(runS(
      """function Point(x, y) { this.x = x; this.y = y; }
        |Point.prototype.sum = function() { return this.x + this.y; };
        |function main() { const p = new Point(3, 4); return p.x + ',' + p.sum(); }""".stripMargin)
      == "3,7")
    // prototype mutation AFTER construction is visible (real delegation, not a copy)
    assert(runN(
      """function F() {}
        |function main() { const a = new F(); F.prototype.v = 42; return a.v; }""".stripMargin) == 42)
    // an explicit object return from the constructor wins
    assert(runS(
      """function G() { return { tag: 'other' }; }
        |function main() { return new G().tag; }""".stripMargin) == "other")
    // own-key iteration and JSON see OWN fields only, never the chain
    assert(runS(
      """function H() { this.own = 1; }
        |H.prototype.inherited = 2;
        |function main() { return Object.keys(new H()).join(',') + '|' + JSON.stringify(new H()); }"""
        .stripMargin) == "own|{\"own\":1}")
  }

  test("class: methods, fields, statics, getter-free instances") {
    assert(runS(
      """class Counter {
        |  count = 0;
        |  static label = 'ctr';
        |  constructor(start) { if (start !== undefined) this.count = start; }
        |  inc(by) { this.count += by === undefined ? 1 : by; return this; }
        |  value() { return this.count; }
        |  static make() { return new Counter(100); }
        |}
        |function main() {
        |  const c = new Counter(5);
        |  c.inc().inc(10);
        |  return c.value() + '|' + Counter.label + '|' + Counter.make().value();
        |}""".stripMargin) == "16|ctr|100")
  }

  test("class: extends, super(...) and super.m(), instanceof through the chain") {
    assert(runS(
      """class Animal {
        |  constructor(name) { this.name = name; }
        |  speak() { return this.name + ' makes a sound'; }
        |}
        |class Dog extends Animal {
        |  constructor(name) { super(name); this.kind = 'dog'; }
        |  speak() { return super.speak() + ': woof'; }
        |}
        |function main() {
        |  const d = new Dog('rex');
        |  return d.speak() + '|' + (d instanceof Dog) + (d instanceof Animal) +
        |    (new Animal('x') instanceof Dog);
        |}""".stripMargin) == "rex makes a sound: woof|truetruefalse")
    // default derived constructor forwards args to super
    assert(runS(
      """class A { constructor(v) { this.v = v; } }
        |class B extends A {}
        |function main() { return new B(7).v; }""".stripMargin) == "7")
  }

  test("Error hierarchy: throw new Error, instanceof, engine errors are Errors") {
    assert(runS(
      """function main() {
        |  try { throw new TypeError('bad type'); }
        |  catch (e) {
        |    return e.message + '|' + e.name + '|' + (e instanceof TypeError) +
        |      (e instanceof Error) + '|' + e.toString();
        |  }
        |}""".stripMargin) == "bad type|TypeError|truetrue|TypeError: bad type")
    // engine-raised errors (undefined reference) are instanceof Error too
    assert(runS(
      """function main() {
        |  try { return noSuchThing; }
        |  catch (e) { return (e instanceof Error) + ''; }
        |}""".stripMargin) == "true")
    // Error('x') without new constructs leniently
    assert(runS("function main() { return Error('x').message; }") == "x")
    // user subclass of Error
    assert(runS(
      """class ParseFail extends Error {
        |  constructor(line) { super('bad line ' + line); this.name = 'ParseFail'; this.line = line; }
        |}
        |function main() {
        |  try { throw new ParseFail(3); }
        |  catch (e) { return e.name + '|' + e.line + '|' + (e instanceof Error); }
        |}""".stripMargin) == "ParseFail|3|true")
  }

  test("Object.create / getPrototypeOf / setPrototypeOf") {
    assert(runS(
      """function main() {
        |  const base = { greet() { return 'hi ' + this.name; } };
        |  const o = Object.create(base);
        |  o.name = 'x';
        |  const delegated = o.greet();
        |  const sameProto = Object.getPrototypeOf(o) === base;
        |  const own = Object.keys(o).join(',');
        |  const p = Object.create(null); p.a = 1;
        |  Object.setPrototypeOf(p, { b: () => 2 });
        |  return delegated + '|' + sameProto + '|' + own + '|' + (p.a + p.b());
        |}""".stripMargin) == "hi x|true|name|3")
  }

  test("call/apply/bind") {
    assert(runS(
      """function greet(punct) { return 'hi ' + this.name + punct; }
        |function main() {
        |  const bound = greet.bind({ name: 'c' }, '?');
        |  return greet.call({ name: 'a' }, '!') + '|' +
        |    greet.apply({ name: 'b' }, ['.']) + '|' + bound();
        |}""".stripMargin) == "hi a!|hi b.|hi c?")
  }

  test("object-literal getters/setters: receiver this, setter routing, get-only ignores writes") {
    assert(runS(
      """function main() {
        |  const o = {
        |    first: 'ada', last: 'l',
        |    get full() { return this.first + ' ' + this.last; },
        |    set full(v) { const i = v.indexOf(' ');
        |                  this.first = v.slice(0, i); this.last = v.slice(i + 1); },
        |    get ro() { return 42; }
        |  };
        |  const before = o.full;
        |  o.full = 'grace h';
        |  o.ro = 99; // get-only: silently ignored (non-strict)
        |  return before + '|' + o.first + '|' + o.last + '|' + o.ro;
        |}""".stripMargin) == "ada l|grace|h|42")
  }

  test("class accessors: instance via prototype, static on the class, inherited setter intercepts") {
    assert(runS(
      """class Temp {
        |  constructor(c) { this._c = c; }
        |  get f() { return this._c * 9 / 5 + 32; }
        |  set f(v) { this._c = (v - 32) * 5 / 9; }
        |  static get unit() { return 'C'; }
        |}
        |class Freezer extends Temp {}
        |function main() {
        |  const t = new Temp(100);
        |  const boiling = t.f;
        |  t.f = 32;            // setter found on the prototype intercepts
        |  const fr = new Freezer(0);
        |  fr.f = 212;          // inherited accessor through the proto chain
        |  return boiling + '|' + t._c + '|' + fr._c + '|' + Temp.unit;
        |}""".stripMargin) == "212|0|100|C")
  }

  test("accessors participate in [[Get]] iteration: JSON/values/assign/spread run getters") {
    assert(runS(
      """function main() {
        |  const o = { a: 1, get b() { return this.a + 1; } };
        |  const j = JSON.stringify(o);
        |  const vals = Object.values(o).join(',');
        |  const spread = { ...o };           // b materializes as data
        |  spread.a = 100;                    // does NOT change spread.b
        |  const assigned = Object.assign({}, o);
        |  return j + '|' + vals + '|' + spread.b + '|' + assigned.b;
        |}""".stripMargin) == """{"a":1,"b":2}|1,2|2|2""")
  }

  test("destructuring assignment expressions: array, object, nesting, defaults, rest") {
    assert(runS(
      """function main() {
        |  let a, b, c, rest, x, y, inner, o2;
        |  [a, b = 99, ...rest] = [1, undefined, 3, 4];
        |  ({ x, q: y = 7, nest: { inner }, ...o2 } = { x: 'X', nest: { inner: 'I' }, extra: 5 });
        |  const swap1 = 'l'; const swap2 = 'r';
        |  let l = swap1, r = swap2;
        |  [l, r] = [r, l];
        |  const tgt = {};
        |  [tgt.m, c] = ['M', 'C'];
        |  return a + '|' + b + '|' + rest.join(',') + '|' + x + '|' + y + '|' +
        |    inner + '|' + JSON.stringify(o2) + '|' + l + r + '|' + tgt.m + c;
        |}""".stripMargin) == """1|99|3,4|X|7|I|{"extra":5}|rl|MC""")
  }

  test("new.target: set under new, undefined in plain calls, propagates through super, lexical in arrows") {
    assert(runS(
      """function F() { this.viaNew = new.target === F; }
        |class A { constructor() { this.t = new.target; this.arrow = (() => new.target)(); } }
        |class B extends A {}
        |function plain() { return new.target === undefined; }
        |function main() {
        |  const f = new F();
        |  const a = new A();
        |  const b = new B(); // super() keeps the ORIGINAL target (B)
        |  return f.viaNew + '|' + (a.t === A) + '|' + (a.arrow === A) + '|' +
        |    (b.t === B) + '|' + plain();
        |}""".stripMargin) == "true|true|true|true|true")
  }

  test("new.target does not leak through a depth-guard throw under new") {
    // a 'recursion too deep' raised while constructing must not leave a
    // stale pending new.target for the NEXT plain call to observe
    assert(runS(
      """function deep() { return deep(); }
        |function Probe() { this.nt = new.target; }
        |function plainProbe() { return new.target === undefined; }
        |function main() {
        |  let threw = false;
        |  try { new deep(); } catch (e) { threw = true; }
        |  return threw + '|' + plainProbe();
        |}""".stripMargin) == "true|true")
  }

  test("cover grammar: {get = d} / {set = d} parse as shorthand-with-default") {
    assert(runS(
      """function main() {
        |  let get, set;
        |  ({get = 1} = {});
        |  ({set = 2} = {set: 9});
        |  const {get: g = 3} = {};
        |  return get + '|' + set + '|' + g;
        |}""".stripMargin) == "1|9|3")
  }

  test("Object.assign performs [[Set]] on the target: setters intercept") {
    assert(runS(
      """function main() {
        |  const log = [];
        |  const t = { set a(v) { log.push('a=' + v); }, get a() { return 'A'; } };
        |  const out = Object.assign(t, { a: 1, b: 2 }, { get c() { return 3; } });
        |  return log.join(',') + '|' + out.a + '|' + out.b + '|' + out.c;
        |}""".stripMargin) == "a=1|A|2|3")
  }

  test("generators: yield sequence, two-way next(v), return value, done protocol") {
    assert(runS(
      """function* counter(start) {
        |  const doubled = yield start;     // receives next(v)'s argument
        |  yield doubled * 2;
        |  return 'end';
        |}
        |function main() {
        |  const g = counter(5);
        |  const a = g.next();        // {value: 5, done: false}
        |  const b = g.next(10);      // doubled = 10 → {value: 20, done: false}
        |  const c = g.next();        // {value: 'end', done: true}
        |  const d = g.next();        // exhausted → {value: undefined, done: true}
        |  return a.value + '|' + a.done + '|' + b.value + '|' + c.value + '|' +
        |    c.done + '|' + (d.value === undefined) + d.done;
        |}""".stripMargin) == "5|false|20|end|true|truetrue")
  }

  test("generators: for-of drives the protocol lazily; break exits an infinite generator") {
    assert(runS(
      """function* naturals() { let i = 0; while (true) yield i++; }
        |function* take(n, it) { for (const x of it) { if (n-- <= 0) return; yield x; } }
        |function main() {
        |  const got = [];
        |  for (const x of naturals()) { if (x > 4) break; got.push(x); }
        |  const t = [...take(3, naturals())];        // spread drains a generator
        |  const f = Array.from(take(2, naturals()), v => v * 10);
        |  return got.join(',') + '|' + t.join(',') + '|' + f.join(',');
        |}""".stripMargin) == "0,1,2,3,4|0,1,2|0,10")
  }

  test("generators: yield* delegation, gen.return runs finally, gen.throw is catchable") {
    assert(runS(
      """function* inner() { yield 1; yield 2; return 'IR'; }
        |function* outer() { const r = yield* inner(); yield r; yield* [7, 8]; }
        |function* guarded(log) {
        |  try { yield 'a'; yield 'b'; }
        |  catch (e) { log.push('caught:' + e); yield 'afterThrow'; }
        |  finally { log.push('fin'); }
        |}
        |function main() {
        |  const o = [...outer()];
        |  const log = [];
        |  const g1 = guarded(log);
        |  g1.next();
        |  const r1 = g1.return('early');  // runs finally, skips catch
        |  const g2 = guarded(log);
        |  g2.next();
        |  const t = g2.throw('boom');     // caught inside, keeps yielding
        |  return o.join(',') + '|' + r1.value + r1.done + '|' + t.value + '|' + log.join(',');
        |}""".stripMargin) == "1,2,IR,7,8|earlytrue|afterThrow|fin,caught:boom")
  }

  test("generator methods in classes and object literals") {
    assert(runS(
      """class Range {
        |  constructor(n) { this.n = n; }
        |  *values() { for (let i = 0; i < this.n; i++) yield i * i; }
        |}
        |function main() {
        |  const lit = { *pair() { yield 'x'; yield 'y'; } };
        |  return [...new Range(4).values()].join(',') + '|' + [...lit.pair()].join('');
        |}""".stripMargin) == "0,1,4,9|xy")
  }

  test("async/await: values, rejection via try/catch, async composition") {
    assert(runS(
      """async function one() { return 1; }
        |async function two() { const a = await one(); return a + (await Promise.resolve(10)); }
        |async function boom() { throw new Error('nope'); }
        |async function safe() {
        |  try { await boom(); return 'unreachable'; }
        |  catch (e) { return 'caught:' + e.message; }
        |}
        |async function main() {
        |  const r = await two();           // 11
        |  const s = await safe();
        |  const plain = await 42;          // await non-promise = value
        |  return r + '|' + s + '|' + plain;
        |}""".stripMargin) == "11|caught:nope|42")
  }

  test("Promise: executor, then-chaining, all/race/allSettled, async arrows") {
    assert(runS(
      """async function main() {
        |  const p = new Promise((resolve, reject) => resolve(3));
        |  const chained = await p.then(v => v + 1).then(v => v * 2);   // 8
        |  const all = await Promise.all([1, Promise.resolve(2), (async () => 3)()]);
        |  const raced = await Promise.race([Promise.resolve('fast'), new Promise(() => {})]);
        |  const settled = await Promise.allSettled([Promise.resolve(1), Promise.reject('no')]);
        |  const kinds = settled.map(s => s.status).join(',');
        |  const caught = await Promise.reject('r').catch(e => 'c:' + e);
        |  const af = async x => x * 7;
        |  return chained + '|' + all.join(',') + '|' + raced + '|' + kinds + '|' +
        |    caught + '|' + (await af(6)) + '|' + Object.keys(p).length;
        |}""".stripMargin) == "8|1,2,3|fast|fulfilled,rejected|c:r|42|0")
  }

  test("yield* full delegation: resume values, throw into inner catch, return runs inner finally") {
    assert(runS(
      """function* inner(log) {
        |  try {
        |    const a = yield 'i1';       // receives the OUTER caller's next(v)
        |    log.push('got:' + a);
        |    yield 'i2';
        |  } catch (e) { log.push('inner-caught:' + e); yield 'recovered'; }
        |  finally { log.push('inner-fin'); }
        |  return 'IDONE';
        |}
        |function* outer(log) { const r = yield* inner(log); yield 'after:' + r; }
        |function main() {
        |  const log = [];
        |  const g = outer(log);
        |  g.next();                     // i1
        |  g.next('X');                  // resume forwards into inner → i2
        |  const t = g.throw('B');       // inner catch handles → 'recovered'
        |  g.next();                     // inner completes → after:IDONE
        |  const log2 = [];
        |  const h = outer(log2);
        |  h.next();
        |  const r = h.return('early');  // inner finally runs
        |  return t.value + '|' + log.join(',') + '|' + r.value + r.done + '|' + log2.join(',');
        |}""".stripMargin) ==
      "recovered|got:X,inner-caught:B,inner-fin|earlytrue|inner-fin")
  }

  test("async generators: next() promises, yield await, for await...of, delegation") {
    assert(runS(
      """async function* agen() {
        |  yield 1;
        |  yield await Promise.resolve(2);      // await inside the body
        |  yield Promise.resolve(3);            // yield p awaits p
        |}
        |async function* outer() { yield 0; yield* agen(); }
        |async function main() {
        |  const got = [];
        |  for await (const x of outer()) got.push(x);
        |  const g = agen();
        |  const first = await g.next();        // next() returns a promise
        |  const viaThen = await g.next().then(r => r.value * 10);
        |  const ret = await g.return('END');
        |  return got.join(',') + '|' + first.value + first.done + '|' + viaThen +
        |    '|' + ret.value + ret.done;
        |}""".stripMargin) == "0,1,2,3|1false|20|ENDtrue")
  }

  test("async generators: rejection routes through the step promise; for await settles values") {
    assert(runS(
      """async function* boom() { yield 1; throw new Error('agen-fail'); }
        |async function main() {
        |  const got = [];
        |  try { for await (const x of boom()) got.push(x); }
        |  catch (e) { got.push('caught:' + e.message); }
        |  for await (const v of [Promise.resolve(7), 8]) got.push(v); // sync src, promised values
        |  return got.join(',');
        |}""".stripMargin) == "1,caught:agen-fail,7,8")
  }

  test("async generator methods in classes and object literals") {
    assert(runS(
      """class Feed {
        |  constructor(n) { this.n = n; }
        |  async *rows() { for (let i = 0; i < this.n; i++) yield await Promise.resolve(i * 2); }
        |}
        |async function main() {
        |  const got = [];
        |  for await (const r of new Feed(3).rows()) got.push(r);
        |  const lit = { async *pair() { yield 'x'; yield 'y'; } };
        |  for await (const c of lit.pair()) got.push(c);
        |  return got.join(',');
        |}""".stripMargin) == "0,2,4,x,y")
  }

  test("for-of abrupt exit closes the generator (IteratorClose runs finally NOW)") {
    assert(runS(
      """function main() {
        |  const log = [];
        |  function* g() { try { yield 1; yield 2; } finally { log.push('closed'); } }
        |  for (const x of g()) break;          // break → return() → finally
        |  log.push('after-break');
        |  try {
        |    for (const x of g()) { throw new Error('body-throw'); }
        |  } catch (e) { log.push('caught'); }  // throw → close first, original wins
        |  return log.join(',');
        |}""".stripMargin) == "closed,after-break,closed,caught")
  }

  test("entrypoint returning a never-settling promise fails loudly, not a silent shell") {
    val e = new Engine()
    e.eval("function main() { return new Promise(() => {}); }")
    val ex = intercept[JsError](e.call("main", Nil))
    assert(ex.getMessage.contains("never settles"))
  }

  test("re-entrant gen.next() from inside the generator body throws, not deadlocks") {
    assert(runS(
      """function* g() { yield self.next(); }
        |let self;
        |function main() {
        |  self = g();
        |  // the body's re-entrant self.next() throws inside the generator,
        |  // which surfaces at THIS resume
        |  try { self.next(); return 'no-throw'; }
        |  catch (e) { return 'threw:' + (e.message.indexOf('already running') >= 0); }
        |}""".stripMargin) == "threw:true")
  }

  test("yield/await stay ordinary identifiers outside generator/async bodies") {
    assert(runN(
      """function main() {
        |  const yield = 4;    // contextual: legal outside generators
        |  let await = 5;
        |  return yield + await;
        |}""".stripMargin) == 9)
  }

  test("Object.entries and defineProperty accessor descriptors") {
    assert(runS(
      """function main() {
        |  const o = { a: 1, get b() { return 2; } };
        |  const e = Object.entries(o).map(p => p[0] + '=' + p[1]).join(',');
        |  const t = { _v: 5 };
        |  Object.defineProperty(t, 'v', {
        |    get: function() { return this._v; },
        |    set: function(x) { this._v = x * 2; }
        |  });
        |  t.v = 10;
        |  Object.defineProperty(t, 'w', { value: 7 });
        |  const ae = Object.entries([8, 9]).map(p => p.join(':')).join(',');
        |  return e + '|' + t.v + '|' + t.w + '|' + ae;
        |}""".stripMargin) == "a=1,b=2|20|7|0:8,1:9")
  }

  test("for-await break settles the async generator's return(): throwing finally propagates") {
    // IteratorClose semantics: a sync for-of propagates a finally-throw on
    // break; the async iterator must not diverge — return()'s rejected
    // promise is settled and its rejection thrown on the break path
    // Engine.call unwraps a rejected promise into JsError("js: uncaught ...")
    val ex = intercept[JsError] {
      run(
        """async function* g() {
          |  try { yield 1; yield 2; }
          |  finally { throw new Error('cleanup failed'); }
          |}
          |async function inner() {
          |  for await (const x of g()) { break; }
          |  return 'unreachable';
          |}
          |function main() { return inner(); }""".stripMargin)
    }
    assert(ex.getMessage.contains("cleanup failed"))
  }

  test("for-await break: clean async-generator finally runs and loop exits normally") {
    assert(runN(
      """let cleaned = 0;
        |async function* g() {
        |  try { yield 1; yield 2; yield 3; }
        |  finally { cleaned = 42; }
        |}
        |async function inner() {
        |  let got = 0;
        |  for await (const x of g()) { got = x; break; }
        |  return got * 100 + cleaned;
        |}
        |function main() { return inner(); }""".stripMargin) == 142)
  }

  test("for-await body throw: original exception wins over finally rejection") {
    val ex = intercept[JsError] {
      run(
        """async function* g() {
          |  try { yield 1; }
          |  finally { throw new Error('secondary'); }
          |}
          |async function inner() {
          |  for await (const x of g()) { throw new Error('primary'); }
          |}
          |function main() { return inner(); }""".stripMargin)
    }
    assert(ex.getMessage.contains("primary"))
  }

  // ——— behavior pins for the four DOCUMENTED ES divergences (MiniJs
  // scaladoc "Documented divergences"): each pin asserts the divergent
  // behavior explicitly so an accidental semantics change — in either
  // direction — fails loudly and forces a deliberate doc+spec update. ———

  test("PINNED divergence: derived-class field initializers run before ctor body") {
    // V8 runs derived fields after super() returns; this host runs them
    // before the constructor body. Pinned: the field value is visible at
    // the TOP of the derived constructor body.
    assert(runN(
      """class A { constructor() { this.base = 1; } }
        |class B extends A {
        |  f = 10;
        |  constructor() { super(); this.seen = this.f; }
        |}
        |function main() { const b = new B(); return b.seen + b.base; }""".stripMargin) == 11)
  }

  test("PINNED divergence: class constructor callable without new (lenient)") {
    // V8 throws TypeError; this host constructs leniently — same instance
    // shape as `new C()`.
    assert(runN(
      """class C { constructor(x) { this.x = x; } double() { return this.x * 2; } }
        |function main() { const c = C(21); return c.double(); }""".stripMargin) == 42)
  }

  test("PINNED divergence: object-to-string does not consult user toString") {
    // V8: '' + obj calls obj.toString(); this host emits the static tag.
    // Explicit .toString() calls the user method — both pinned.
    assert(runS(
      """function main() {
        |  const o = { toString() { return 'custom'; } };
        |  return ('' + o) + '|' + o.toString();
        |}""".stripMargin) == "[object Object]|custom")
  }

  test("PINNED divergence: property-descriptor attributes are ignored") {
    // Object.create's descriptor maps contribute `value` only —
    // writable:false does NOT freeze the property in this host.
    assert(runN(
      """function main() {
        |  const o = Object.create(null, { x: { value: 1, writable: false } });
        |  o.x = 5; // V8 (strict): throws / (sloppy): silently ignored
        |  return o.x; // pinned: the write LANDS here
        |}""".stripMargin) == 5)
  }
}
