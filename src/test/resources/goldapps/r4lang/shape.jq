# round-4 jq surface through a real stream part
._id as $id
| {
    id: $id,
    total: (.counts | add),
    sorted: (.counts | sort),
    top2: (.counts | sort | reverse | .[0:2]),
    entries: (.m | to_entries | sort_by(.key) | map("\(.key)=\(.value)") | join(",")),
    fixed: (.name | gsub("(?<d>[0-9])"; "<\(.d)>")),
    grouped: (.words | group_by(.) | map({w: .[0], n: length}))
  }
| .flag = (.total > 10)
