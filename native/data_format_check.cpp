// Golden generator for .data byte-parity tests.
//
// Emits trajectory lines through the exact formatting path the reference
// example uses (/root/reference/examples/solver-example.cpp:73-81): default
// std::ostream double insertion (6 significant digits).  The Python writers
// (osqp_solver_tpu/utils/trajectory_io.py) must produce identical bytes;
// tests/test_example_app.py compiles and runs this to check.
//
// Usage: data_format_check <mode> v0 v1 ... (mode: ctrl6 | xyz3)
//   ctrl6: groups of 6 values -> "a b c d e f\n"
//   xyz3:  groups of 3 values -> "(x, y, z)\n"

#include <cstdlib>
#include <cstring>
#include <iostream>
#include <vector>

int main(int argc, char** argv) {
  if (argc < 2) return 1;
  std::vector<double> v;
  for (int i = 2; i < argc; ++i) v.push_back(std::atof(argv[i]));
  if (std::strcmp(argv[1], "ctrl6") == 0) {
    for (size_t i = 0; i + 5 < v.size(); i += 6)
      std::cout << v[i] << " " << v[i + 1] << " " << v[i + 2] << " "
                << v[i + 3] << " " << v[i + 4] << " " << v[i + 5] << "\n";
  } else if (std::strcmp(argv[1], "xyz3") == 0) {
    for (size_t i = 0; i + 2 < v.size(); i += 3)
      std::cout << "(" << v[i] << ", " << v[i + 1] << ", " << v[i + 2] << ")"
                << "\n";
  } else {
    return 1;
  }
  return 0;
}
