.state + { "value": .state.value + 1 }
