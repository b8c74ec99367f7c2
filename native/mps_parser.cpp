// Fast exact MPS/SIF parser.
//
// Native analog of the reference's io layer (src/io/mps/parse — compiled
// Rust there, C++ here): tokenizes the file, resolves row/column names to
// indices, and parses numbers *exactly* as (mantissa, power-of-ten) pairs so
// the Python side can build rationals without precision loss
// (reference: io/mps/number/parse.rs keeps decimals exact the same way).
//
// Exposed as a C API consumed via ctypes.  Output is a flat record table:
// each record is (kind, a, b, mantissa, exp10):
//   kind 0: row declaration         a=row type ('N','E','L','G'), b=name id
//   kind 1: column entry            a=col id, b=row id
//   kind 2: cost entry              a=col id
//   kind 3: rhs entry               a=group name id, b=row id
//   kind 4: range entry             a=group name id, b=row id
//   kind 5: bound entry             a=bound type chars, b=group name id,
//                                   mantissa/exp10 = value, extra=col id
//   kind 6: column type toggle      a=1 integer / 0 continuous
// Name ids index into a string table (all names, '\n'-separated, in first-
// appearance order per namespace).  Rows are NOT sorted here; the Python
// layer applies the reference's sort-by-name semantics.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC -o libmps_parser.so mps_parser.cpp

#include <cstdint>
#include <cstring>
#include <string>
#include <string_view>
#include <unordered_map>
#include <vector>

namespace {

struct Record {
  int32_t kind;
  int64_t a;
  int64_t b;
  int64_t extra;
  int64_t mantissa;
  int32_t exp10;
};

struct ParseResult {
  std::vector<Record> records;
  std::string row_names;   // '\n'-separated
  std::string col_names;   // '\n'-separated
  std::string name;        // program name
  std::string cost_row;    // cost row name
  std::string error;
  int32_t objective_max = 0;
};

bool is_space(char c) { return c == ' ' || c == '\t' || c == '\r'; }

// Exact decimal parse: value = sign * mantissa * 10^exp10.
// Handles [+-]?digits[.digits][(eEdD)[+-]?digits].  Returns false on
// malformed input or mantissa overflow (>63 bits).
bool parse_number(std::string_view text, int64_t* mantissa, int32_t* exp10) {
  if (text.empty()) return false;
  size_t i = 0;
  bool negative = false;
  if (text[i] == '+' || text[i] == '-') {
    negative = text[i] == '-';
    ++i;
  }
  unsigned long long mag = 0;
  int32_t exponent = 0;
  bool any_digit = false;
  // Strict guard: mag*10 + 9 must stay <= INT64_MAX, so require
  // mag <= (INT64_MAX - 9) / 10.
  constexpr unsigned long long kMaxBeforeDigit = 922337203685477579ULL;
  for (; i < text.size() && text[i] >= '0' && text[i] <= '9'; ++i) {
    if (mag > kMaxBeforeDigit) return false;
    mag = mag * 10 + (text[i] - '0');
    any_digit = true;
  }
  if (i < text.size() && text[i] == '.') {
    ++i;
    for (; i < text.size() && text[i] >= '0' && text[i] <= '9'; ++i) {
      if (mag > kMaxBeforeDigit) return false;
      mag = mag * 10 + (text[i] - '0');
      --exponent;
      any_digit = true;
    }
  }
  if (!any_digit) return false;
  if (i < text.size() &&
      (text[i] == 'e' || text[i] == 'E' || text[i] == 'd' || text[i] == 'D')) {
    ++i;
    bool exp_neg = false;
    if (i < text.size() && (text[i] == '+' || text[i] == '-')) {
      exp_neg = text[i] == '-';
      ++i;
    }
    if (i >= text.size()) return false;
    int32_t e = 0;
    for (; i < text.size() && text[i] >= '0' && text[i] <= '9'; ++i) {
      e = e * 10 + (text[i] - '0');
      if (e > 10000) return false;
    }
    exponent += exp_neg ? -e : e;
  }
  if (i != text.size()) return false;
  *mantissa = negative ? -static_cast<int64_t>(mag) : static_cast<int64_t>(mag);
  *exp10 = exponent;
  return true;
}

class NameTable {
 public:
  int64_t intern(std::string_view name) {
    auto it = index_.find(std::string(name));
    if (it != index_.end()) return it->second;
    int64_t id = static_cast<int64_t>(names_.size());
    names_.emplace_back(name);
    index_.emplace(names_.back(), id);
    return id;
  }
  int64_t lookup(std::string_view name) const {
    auto it = index_.find(std::string(name));
    return it == index_.end() ? -1 : it->second;
  }
  std::string joined() const {
    std::string out;
    for (const auto& n : names_) {
      out += n;
      out += '\n';
    }
    return out;
  }

 private:
  std::vector<std::string> names_;
  std::unordered_map<std::string, int64_t> index_;
};

struct Line {
  std::string_view text;
  size_t number;
};

// Tokenize a data line by whitespace (free) — fixed-format field positions
// are also handled by the caller re-slicing when needed.
std::vector<std::string_view> split_ws(std::string_view line) {
  std::vector<std::string_view> out;
  size_t i = 0;
  while (i < line.size()) {
    while (i < line.size() && is_space(line[i])) ++i;
    size_t start = i;
    while (i < line.size() && !is_space(line[i])) ++i;
    if (i > start) out.push_back(line.substr(start, i - start));
  }
  return out;
}

std::string_view field(std::string_view line, size_t lo, size_t hi) {
  if (line.size() <= lo) return {};
  size_t end = hi < line.size() ? hi : line.size();
  std::string_view f = line.substr(lo, end - lo);
  size_t a = 0, b = f.size();
  while (a < b && is_space(f[a])) ++a;
  while (b > a && is_space(f[b - 1])) --b;
  return f.substr(a, b - a);
}

constexpr size_t F2_LO = 4, F2_HI = 12;
constexpr size_t F3_LO = 14, F3_HI = 22;
constexpr size_t F4_LO = 24, F4_HI = 36;
constexpr size_t F5_LO = 39, F5_HI = 47;
constexpr size_t F6_LO = 49, F6_HI = 61;

ParseResult* parse_impl(const char* data, size_t size, bool fixed) {
  auto* result = new ParseResult();
  std::string_view text(data, size);

  std::vector<Line> lines;
  size_t line_no = 0;
  size_t pos = 0;
  while (pos <= text.size()) {
    size_t nl = text.find('\n', pos);
    std::string_view line =
        nl == std::string_view::npos ? text.substr(pos) : text.substr(pos, nl - pos);
    ++line_no;
    if (!line.empty() && line.back() == '\r') line.remove_suffix(1);
    if (!line.empty()) {
      size_t first = 0;
      while (first < line.size() && is_space(line[first])) ++first;
      // '&'-prefixed lines (column 1) are stray comments in some netlib
      // SIF files (CRE-C); '&' never starts a section keyword or data line.
      bool comment = (first < line.size() && line[first] == '*') ||
                     (first == 0 && !line.empty() && line[0] == '&');
      if (first < line.size() && !comment) lines.push_back({line, line_no});
    }
    if (nl == std::string_view::npos) break;
    pos = nl + 1;
  }

  auto fail = [&](size_t number, const std::string& message) {
    result->error = "line " + std::to_string(number) + ": " + message;
    return result;
  };

  size_t idx = 0;
  if (idx >= lines.size() || lines[idx].text.substr(0, 4) != "NAME")
    return fail(idx < lines.size() ? lines[idx].number : 0, "expected NAME");
  {
    auto parts = split_ws(lines[idx].text.substr(4));
    if (!parts.empty()) result->name = std::string(parts[0]);
  }
  ++idx;

  // OBJSENSE (optional)
  if (idx < lines.size() && split_ws(lines[idx].text).size() == 1 &&
      split_ws(lines[idx].text)[0] == "OBJSENSE") {
    ++idx;
    if (idx >= lines.size()) return fail(0, "OBJSENSE at EOF");
    auto parts = split_ws(lines[idx].text);
    if (!parts.empty() && (parts[0] == "MAX" || parts[0] == "MAXIMIZE"))
      result->objective_max = 1;
    ++idx;
  }
  if (idx >= lines.size() || split_ws(lines[idx].text)[0] != "ROWS")
    return fail(idx < lines.size() ? lines[idx].number : 0, "expected ROWS");
  ++idx;

  NameTable rows, cols;
  // ROWS section
  for (; idx < lines.size(); ++idx) {
    std::string_view line = lines[idx].text;
    if (!is_space(line[0])) break;
    auto parts = split_ws(line);
    if (parts.size() < 2) return fail(lines[idx].number, "short row line");
    char type = parts[0].size() == 1 ? parts[0][0] : 0;
    if (type == 'N') {
      if (!result->cost_row.empty())
        return fail(lines[idx].number, "second cost row");
      result->cost_row = std::string(parts[1]);
    } else if (type == 'E' || type == 'L' || type == 'G') {
      int64_t id = rows.intern(parts[1]);
      result->records.push_back({0, type, id, 0, 0, 0});
    } else {
      return fail(lines[idx].number, "unknown row type");
    }
  }

  auto expect_section = [&](std::string_view want) {
    return idx < lines.size() && split_ws(lines[idx].text)[0] == want;
  };

  if (!expect_section("COLUMNS"))
    return fail(idx < lines.size() ? lines[idx].number : 0, "expected COLUMNS");
  ++idx;

  int64_t current_col = -1;
  std::string current_col_name;
  bool integer_mode = false;

  auto handle_pair = [&](std::string_view row_name, std::string_view value,
                         size_t number) -> bool {
    int64_t mantissa;
    int32_t exp10;
    if (!parse_number(value, &mantissa, &exp10)) {
      result->error =
          "line " + std::to_string(number) + ": bad number '" + std::string(value) + "'";
      return false;
    }
    int64_t row = rows.lookup(row_name);
    if (row < 0) {
      if (row_name == result->cost_row) {
        result->records.push_back({2, current_col, 0, 0, mantissa, exp10});
        return true;
      }
      result->error =
          "line " + std::to_string(number) + ": unknown row '" + std::string(row_name) + "'";
      return false;
    }
    result->records.push_back({1, current_col, row, 0, mantissa, exp10});
    return true;
  };

  for (; idx < lines.size(); ++idx) {
    std::string_view line = lines[idx].text;
    if (!is_space(line[0])) break;
    std::string_view name_f, row_f, val_f, row2_f, val2_f;
    bool marker = false;
    std::string_view marker_kind;
    if (fixed) {
      name_f = field(line, F2_LO, F2_HI);
      row_f = field(line, F3_LO, F3_HI);
      val_f = field(line, F4_LO, F4_HI);
      row2_f = field(line, F5_LO, F5_HI);
      val2_f = field(line, F6_LO, F6_HI);
      if (row_f == "'MARKER'") {
        marker = true;
        marker_kind = row2_f;
      }
    } else {
      auto parts = split_ws(line);
      if (parts.size() >= 3 && parts[1] == "'MARKER'") {
        marker = true;
        marker_kind = parts[2];
      } else {
        if (parts.size() < 3) return fail(lines[idx].number, "short column line");
        name_f = parts[0];
        row_f = parts[1];
        val_f = parts[2];
        if (parts.size() >= 5) {
          row2_f = parts[3];
          val2_f = parts[4];
        }
      }
    }
    if (marker) {
      if (marker_kind == "'INTORG'") integer_mode = true;
      else if (marker_kind == "'INTEND'") integer_mode = false;
      else return fail(lines[idx].number, "unknown marker");
      result->records.push_back({6, integer_mode ? 1 : 0, 0, 0, 0, 0});
      continue;
    }
    if (!name_f.empty() &&
        (current_col < 0 || name_f != current_col_name)) {
      if (cols.lookup(name_f) >= 0) {
        return fail(lines[idx].number, "duplicate column name");
      }
      current_col = cols.intern(name_f);
      current_col_name = std::string(name_f);
    }
    if (current_col < 0) return fail(lines[idx].number, "entry before column name");
    if (!handle_pair(row_f, val_f, lines[idx].number)) return result;
    if (!row2_f.empty()) {
      if (!handle_pair(row2_f, val2_f, lines[idx].number)) return result;
    }
  }

  NameTable groups;  // rhs/range/bound group names share a table

  auto value_section = [&](int32_t kind) -> bool {
    ++idx;
    int64_t current_group = -1;
    std::string current_group_name;
    for (; idx < lines.size(); ++idx) {
      std::string_view line = lines[idx].text;
      if (!is_space(line[0])) return true;
      std::string_view name_f, row_f, val_f, row2_f, val2_f;
      if (fixed) {
        name_f = field(line, F2_LO, F2_HI);
        row_f = field(line, F3_LO, F3_HI);
        val_f = field(line, F4_LO, F4_HI);
        row2_f = field(line, F5_LO, F5_HI);
        val2_f = field(line, F6_LO, F6_HI);
      } else {
        auto parts = split_ws(line);
        if (parts.size() < 3) {
          result->error = "line " + std::to_string(lines[idx].number) + ": short line";
          return false;
        }
        name_f = parts[0];
        row_f = parts[1];
        val_f = parts[2];
        if (parts.size() >= 5) {
          row2_f = parts[3];
          val2_f = parts[4];
        }
      }
      if (!name_f.empty() &&
          (current_group < 0 || name_f != current_group_name)) {
        current_group = groups.intern(name_f);
        current_group_name = std::string(name_f);
      }
      if (current_group < 0) {
        // Empty group name opens an anonymous group (netlib BLEND).
        current_group = groups.intern("");
        current_group_name = "";
      }
      auto one = [&](std::string_view rn, std::string_view vv) -> bool {
        int64_t mantissa;
        int32_t exp10;
        if (!parse_number(vv, &mantissa, &exp10)) {
          result->error = "line " + std::to_string(lines[idx].number) +
                          ": bad number '" + std::string(vv) + "'";
          return false;
        }
        int64_t row = rows.lookup(rn);
        if (row < 0) {
          if (kind == 3 && rn == result->cost_row) {
            // RHS on the objective row: objective constant (kind 7).
            // The reference errors here (GROW15/GROW22 ship untested).
            result->records.push_back({7, 0, 0, 0, mantissa, exp10});
            return true;
          }
          result->error = "line " + std::to_string(lines[idx].number) +
                          ": unknown row '" + std::string(rn) + "'";
          return false;
        }
        result->records.push_back({kind, current_group, row, 0, mantissa, exp10});
        return true;
      };
      if (!one(row_f, val_f)) return false;
      if (!row2_f.empty() && !one(row2_f, val2_f)) return false;
    }
    return true;
  };

  if (expect_section("RHS")) {
    if (!value_section(3)) return result;
  }
  if (expect_section("RANGES")) {
    if (!value_section(4)) return result;
  }
  if (expect_section("BOUNDS")) {
    ++idx;
    for (; idx < lines.size(); ++idx) {
      std::string_view line = lines[idx].text;
      if (!is_space(line[0])) break;
      std::string_view kind_f, group_f, col_f, val_f;
      if (fixed) {
        kind_f = field(line, 1, 3);
        group_f = field(line, F2_LO, F2_HI);
        col_f = field(line, F3_LO, F3_HI);
        val_f = field(line, F4_LO, F4_HI);
      } else {
        auto parts = split_ws(line);
        if (parts.size() < 3) return fail(lines[idx].number, "short bound line");
        kind_f = parts[0];
        group_f = parts[1];
        col_f = parts[2];
        if (parts.size() > 3) val_f = parts[3];
      }
      int64_t col = cols.lookup(col_f);
      if (col < 0) return fail(lines[idx].number, "unknown column in bounds");
      int64_t group = groups.intern(group_f);
      int64_t mantissa = 0;
      int32_t exp10 = 0;
      bool needs_value = kind_f == "LO" || kind_f == "UP" || kind_f == "FX" ||
                         kind_f == "LI" || kind_f == "UI";
      bool no_value = kind_f == "FR" || kind_f == "MI" || kind_f == "PL" ||
                      kind_f == "BV";
      if (!needs_value && !no_value)
        return fail(lines[idx].number, "unknown bound type");
      if (needs_value && !parse_number(val_f, &mantissa, &exp10))
        return fail(lines[idx].number, "bad bound value");
      int64_t packed_kind =
          (static_cast<int64_t>(kind_f[0]) << 8) | static_cast<int64_t>(kind_f[1]);
      result->records.push_back({5, packed_kind, group, col, mantissa, exp10});
    }
  }
  if (!expect_section("ENDATA"))
    return fail(idx < lines.size() ? lines[idx].number : 0, "expected ENDATA");

  result->row_names = rows.joined();
  result->col_names = cols.joined();
  return result;
}

}  // namespace

extern "C" {

void* mps_parse(const char* data, int64_t size, int32_t fixed) {
  return parse_impl(data, static_cast<size_t>(size), fixed != 0);
}

int64_t mps_num_records(void* handle) {
  return static_cast<ParseResult*>(handle)->records.size();
}

const Record* mps_records(void* handle) {
  return static_cast<ParseResult*>(handle)->records.data();
}

const char* mps_row_names(void* handle) {
  return static_cast<ParseResult*>(handle)->row_names.c_str();
}

const char* mps_col_names(void* handle) {
  return static_cast<ParseResult*>(handle)->col_names.c_str();
}

const char* mps_program_name(void* handle) {
  return static_cast<ParseResult*>(handle)->name.c_str();
}

const char* mps_cost_row(void* handle) {
  return static_cast<ParseResult*>(handle)->cost_row.c_str();
}

const char* mps_error(void* handle) {
  return static_cast<ParseResult*>(handle)->error.c_str();
}

int32_t mps_objective_max(void* handle) {
  return static_cast<ParseResult*>(handle)->objective_max;
}

void mps_free(void* handle) { delete static_cast<ParseResult*>(handle); }

}  // extern "C"
