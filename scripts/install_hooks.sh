#!/bin/sh
# Install the repo's git hooks (currently: the ledger-freshness
# pre-commit gate). Run once per clone: sh scripts/install_hooks.sh
set -e
repo_root=$(git rev-parse --show-toplevel)
hook="$repo_root/.git/hooks/pre-commit"
cat > "$hook" <<'EOF'
#!/bin/sh
# Ledger-freshness gate: only fires when the contract surface is staged.
if git diff --cached --name-only | grep -qE '^(__spark_entry__\.py|cuplyr_spark/)'; then
    exec python scripts/precommit_gate.py
fi
exit 0
EOF
chmod +x "$hook"
echo "installed $hook"
