// lexp parser fast path (reference capability: lexp.cc — the framework's
// uniform config grammar `(k=v,k2=(a=1,b=2))`).
//
// Exact grammar + error-message parity with boda_tpu/core/lexp.py's
// _Parser (error strings are part of the regression-test surface).
// Output is a flat pre-order node table consumed over the C ABI:
// the Python side (or any other host) rebuilds its tree in one pass.
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Node {
  int32_t parent;    // -1 for root
  uint8_t is_leaf;
  std::string name;  // name under parent ("_" positional, "" for root)
  std::string val;   // leaf value (unescaped); empty for lists
};

struct Result {
  std::vector<Node> nodes;
  std::string err;
};

struct Parser {
  const std::string s;
  size_t i = 0;
  Result *res;

  explicit Parser(const char *src, Result *r) : s(src), res(r) {}

  bool fail(const std::string &msg) {
    char head[32];
    snprintf(head, sizeof head, "%zu", i);
    res->err = "lexp parse error at char " + std::string(head) + " of '" + s +
               "': " + msg;
    return false;
  }

  int peek() const { return i < s.size() ? (unsigned char)s[i] : -1; }

  bool parse_value(int32_t parent, const std::string &name) {
    if (peek() == '(') return parse_list(parent, name);
    return parse_leaf(parent, name);
  }

  bool parse_leaf(int32_t parent, const std::string &name) {
    std::string out;
    while (i < s.size()) {
      char c = s[i];
      if (c == '\\') {
        if (i + 1 >= s.size())
          return fail("unexpected end of input after escape char '\\' (expected char)");
        out.push_back(s[i + 1]);
        i += 2;
        continue;
      }
      if (c == '%' && i + 1 < s.size() && s[i + 1] == '(') {
        // %(var) interpolation refs pass through leaf values verbatim
        size_t j = s.find(')', i + 2);
        if (j == std::string::npos)
          return fail("unterminated %(var reference in leaf value");
        out.append(s, i, j + 1 - i);
        i = j + 1;
        continue;
      }
      if (c == ',' || c == ')') break;
      if (c == '(')
        return fail("unexpected '(' inside leaf value (escape it as '\\(' if intended)");
      out.push_back(c);
      i += 1;
    }
    res->nodes.push_back(Node{parent, 1, name, out});
    return true;
  }

  bool parse_name(std::string &out) {
    out.clear();
    while (i < s.size()) {
      char c = s[i];
      if (c == '=') return true;
      if (c == ',' || c == '(' || c == ')' || c == '\\') break;
      out.push_back(c);
      i += 1;
    }
    return fail("expected '=' after name in list element");
  }

  bool parse_list(int32_t parent, const std::string &name) {
    // assert s[i] == '('
    i += 1;
    res->nodes.push_back(Node{parent, 0, name, ""});
    int32_t self = (int32_t)res->nodes.size() - 1;
    if (peek() == ')') { i += 1; return true; }
    for (;;) {
      if (peek() < 0)
        return fail("unexpected end of input inside list (expected ')')");
      if (peek() == ')') { i += 1; break; }  // trailing comma case
      size_t save = i;
      std::string kid_name = "_";
      // scan ahead for an unescaped '=' before any of ',()' → named
      size_t j = i;
      bool named = false;
      while (j < s.size()) {
        char c = s[j];
        if (c == '\\') { j += 2; continue; }
        if (c == '=') { named = true; break; }
        if (c == ',' || c == '(' || c == ')') break;
        j += 1;
      }
      if (named) {
        if (!parse_name(kid_name)) return false;
        if (kid_name.empty()) { i = save; return fail("empty name in list element"); }
        i += 1;  // consume '='
      }
      if (!parse_value(self, kid_name)) return false;
      int c = peek();
      if (c == ',') i += 1;
      else if (c == ')') { i += 1; break; }
      else if (c < 0)
        return fail("unexpected end of input inside list (expected ',' or ')')");
      else
        return fail(std::string("expected ',' or ')' after list element, saw '") +
                    (char)c + "'");
    }
    return true;
  }
};

}  // namespace

extern "C" {

// Parse s; returns an opaque handle (never NULL). Check boda_lexp_err().
void *boda_lexp_parse(const char *s) {
  Result *r = new Result;
  Parser p(s, r);
  if (p.parse_value(-1, "")) {
    if (p.i != p.s.size())
      p.fail("trailing characters after lexp: '" + p.s.substr(p.i) + "'");
  }
  if (!r->err.empty()) r->nodes.clear();
  return r;
}

const char *boda_lexp_err(void *h) {
  Result *r = (Result *)h;
  return r->err.empty() ? nullptr : r->err.c_str();
}

int32_t boda_lexp_n_nodes(void *h) { return (int32_t)((Result *)h)->nodes.size(); }

// Fills per-node fields. Returned strings live until boda_lexp_free.
void boda_lexp_node(void *h, int32_t idx, int32_t *parent, int32_t *is_leaf,
                    const char **name, const char **val) {
  const Node &n = ((Result *)h)->nodes[(size_t)idx];
  *parent = n.parent;
  *is_leaf = n.is_leaf;
  *name = n.name.c_str();
  *val = n.val.c_str();
}

void boda_lexp_free(void *h) { delete (Result *)h; }

}  // extern "C"
