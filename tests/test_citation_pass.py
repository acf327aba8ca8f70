import subprocess, sys, os

def test_citation_pass_empty(tmp_path):
    r = subprocess.run([sys.executable, "scripts/citation_pass.py",
                        str(tmp_path)], capture_output=True, text=True)
    assert r.returncode == 0 and "EMPTY" in r.stdout

def test_citation_pass_nonempty(tmp_path):
    (tmp_path / "main.cpp").write_text(
        "int main(int argc, char** argv) { return 0; }\n"
        "// transitive reduction happens here\n")
    (tmp_path / "README.md").write_text("run: ./SAGE2 -k 25 reads.fastq\n")
    r = subprocess.run([sys.executable, "scripts/citation_pass.py",
                        str(tmp_path)], capture_output=True, text=True)
    assert r.returncode == 0
    assert "NON-EMPTY" in r.stdout and "main.cpp" in r.stdout
    assert "TODO" in r.stdout
