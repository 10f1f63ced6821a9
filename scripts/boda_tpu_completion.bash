# bash completion for `python -m boda_tpu` / the boda_tpu CLI
# (reference capability: scripts/boda_completion.bash)
# Source this file, then: boda_tpu <TAB> completes mode names,
# boda_tpu <mode> --<TAB> completes that mode's flags.
_boda_tpu_complete() {
    local cur prev modes
    cur="${COMP_WORDS[COMP_CWORD]}"
    if [ "$COMP_CWORD" -eq 1 ]; then
        modes=$(python -m boda_tpu help 2>/dev/null | awk 'NR>1{print $1}')
        COMPREPLY=($(compgen -W "help $modes" -- "$cur"))
        return
    fi
    local mode="${COMP_WORDS[1]}"
    if [[ "$cur" == --* ]]; then
        local flags
        flags=$(python -m boda_tpu help "$mode" 2>/dev/null |
                grep -oE -- '--[a-z0-9_]+' | sort -u | tr '_' '-')
        COMPREPLY=($(compgen -W "$flags" -- "$cur"))
    fi
}
complete -F _boda_tpu_complete boda_tpu
complete -F _boda_tpu_complete python\ -m\ boda_tpu 2>/dev/null || true
